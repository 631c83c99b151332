# ircsn_ig65m_pretrained_bnfrozen_r152_32x2x1_58e_kinetics400_rgb (parity: reference configs/recognition/csn/ircsn_ig65m_pretrained_bnfrozen_r152_32x2x1_58e_kinetics400_rgb.py)
_base_ = "./ircsn_ig65m_pretrained_r152_32x2x1_58e_kinetics400_rgb.py"

# frozen BN finetuning (reference: norm_eval=True, bn_frozen=True) — BN
# always uses running stats; the trainer routes BN affine params to the
# frozen partition
model = dict(backbone=dict(norm_eval=True, bn_frozen=True))
work_dir = "./work_dirs/ircsn_ig65m_pretrained_bnfrozen_r152_32x2x1_58e_kinetics400_rgb"
