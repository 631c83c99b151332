# ssn_r50_450e_thumos14_rgb_test (parity: reference configs/localization/ssn/ssn_r50_450e_thumos14_rgb_test.py)
# SSN test-time recipe:
# STPP head in test layout, tiled snippets over the untrimmed video
# (reference ssn_r50_450e_thumos14_rgb_test.py). Evaluation-only.
_base_ = "./ssn_r50_450e_thumos14_rgb_train.py"

model = dict(
    test_cfg=dict(ssn=dict(sampler=dict(test_interval=6, batch_size=16),
                           evaluater=dict(top_k=2000, nms=0.2,
                                          softmax_before_filter=True,
                                          cls_score_dict=None,
                                          cls_top_k=2))))

data = dict(
    train=None,
    test=dict(test_mode=True),
)
optimizer = None
total_epochs = None

# Reference hyperparameter fidelity overrides (merged
# reference ssn_r50_450e_thumos14_rgb_test.py values; generated)
_t = dict(globals().get('optimizer') or {})
_t['type'] = 'SGD'
_t['lr'] = 0.001
_t['momentum'] = 0.9
_t['weight_decay'] = 1e-06
optimizer = _t
total_epochs = 450
_t = dict(globals().get('optimizer_config') or {})
_t['grad_clip'] = dict(_t.get('grad_clip') or {})
_t['grad_clip']['max_norm'] = 35
optimizer_config = _t
del _t
