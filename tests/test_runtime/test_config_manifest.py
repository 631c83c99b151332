"""Reference config-name manifest: every recipe in the reference's vit
family (and the other families this repo claims) must have a same-named or
documented-equivalent config here (VERDICT §2.8: 'every reference
vit-family config has a repo equivalent that builds')."""

import glob
import os.path as osp

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))

# basename -> repo equivalent (None = same name)
REFERENCE_VIT_CONFIGS = {
    # top-level
    "timesformer_k400.py": None,
    "vit_imagenet_k400.py": None,
    "vit_imagenet_ssv2.py": None,
    "vitclip_base_diving48.py": None,
    "vitclip_base_hmdb51.py": None,
    "vitclip_base_k400.py": None,
    "vitclip_base_k700.py": None,
    "vitclip_base_sthv2.py": None,
    "vitclip_large_diving48.py": None,
    "vitclip_large_k400.py": None,
    "vitclip_large_k700.py": None,
    "vitclip_large_sthv2.py": None,
    # AIM/
    "AIM_base_diving48.py": None,
    "AIM_base_hmdb51.py": None,
    "AIM_flash_base_diving48.py": None,
    "AIM_flash_base_hmdb51.py": None,
    "AIM_flash_base_ucf101.py": None,
    "AIM_flash_dual_base_hmdb51.py": None,
    "AIM_flash_win_base_diving48.py": None,
    "AIM_flash_win_base_hmdb51.py": None,
    "AIM_flash_win_base_sthv2.py": None,
    "AIM_flash_win_base_ucf101.py": None,
    # flash_attn/
    "vitclip_flash_base_diving48.py": None,
    "vitclip_flash_base_hmdb51.py": None,
    "vitclip_flash_restuning_base_diving48.py": None,
    "vitclip_flash_restuning_base_hmdb51.py": None,
    # zeroI2V/
    "vitclip_zeroI2V_base_diving48.py": None,
    "vitclip_zeroI2V_base_hmdb51.py": None,
    "vitclip_zeroI2V_base_sthv2.py": None,
}


def test_reference_vit_config_manifest():
    present = {osp.basename(p)
               for p in glob.glob(osp.join(REPO, "configs", "**", "*.py"),
                                  recursive=True)}
    missing = [name for name, equiv in REFERENCE_VIT_CONFIGS.items()
               if (equiv or name) not in present]
    assert not missing, f"reference configs without a repo equivalent: {missing}"


def test_family_coverage():
    """One config per claimed family beyond the vit tree."""
    for needle in ("swin2d_adapter", "slowonly_kinetics_pretrained",
                   "posec3d",
                   # reference config families (one recipe each):
                   # recognition/{tsn,tsm,i3d,slowfast,slowonly,x3d,csn,
                   # r2plus1d,c3d,tanet,tin,tpn,trn,omnisource},
                   # recognition_audio, localization/{bmn,bsn,ssn},
                   # detection/{ava,lfb,acrn}
                   "tsn_r50", "tsm_r50", "i3d_r50", "slowfast_r50",
                   "slowonly_r50", "x3d_m", "ircsn", "r2plus1d", "c3d",
                   "tanet", "tin_r50", "tpn_slowonly", "tpn_tsm",
                   "trn_r50", "omnisource", "audio", "bmn", "bsn", "ssn",
                   "lfb", "acrn"):
        hits = glob.glob(osp.join(REPO, "configs", "**", f"*{needle}*"),
                         recursive=True) + glob.glob(
            osp.join(REPO, "configs", "**", needle, "*"), recursive=True)
        assert hits, f"no config found for family {needle}"


def test_every_reference_config_has_same_named_equivalent():
    """Round-3 closure: EVERY reference recipe basename (outside _base_)
    exists here under the same name — full config-surface parity."""
    ref = "/root/reference/configs"
    if not osp.isdir(ref):
        import pytest
        pytest.skip("reference tree not available")
    ref_names = {osp.basename(p)
                 for p in glob.glob(osp.join(ref, "**", "*.py"),
                                    recursive=True)
                 if "_base_" not in p.split(osp.sep)}
    present = {osp.basename(p)
               for p in glob.glob(osp.join(REPO, "configs", "**", "*.py"),
                                  recursive=True)}
    missing = sorted(ref_names - present)
    assert not missing, f"reference configs without a same-named repo config: {missing}"


def _get(d, path):
    cur = d
    for k in path.split("."):
        if isinstance(cur, dict) and k in cur:
            cur = cur[k]
        else:
            return None
    return cur


def test_reference_config_hyperparameter_fidelity():
    """Round-3 closure, part 2: shared-basename configs carry the
    REFERENCE's training hyperparameters — batch size, optimizer, lr
    schedule, epochs, grad clip, and headline model fields. The reference
    configs parse through this repo's own Config (same mmcv dict format),
    so the comparison reads the reference's merged values directly.

    Known skip: the reference's vit/zeroI2V/vitclip_zeroI2V_base_sthv2.py
    has a broken ``_base_`` path (``../../_base_`` from three levels deep;
    its siblings correctly use ``../../../``) and cannot be parsed even by
    the reference's own tooling."""
    from adapt_image_models_tpu.config import Config
    ref = "/root/reference/configs"
    if not osp.isdir(ref):
        import pytest
        pytest.skip("reference tree not available")
    repo_by_base = {}
    for p in glob.glob(osp.join(REPO, "configs", "**", "*.py"),
                       recursive=True):
        repo_by_base.setdefault(osp.basename(p), p)
    keys = ("data.videos_per_gpu", "optimizer.type", "optimizer.lr",
            "optimizer.momentum", "optimizer.weight_decay", "total_epochs",
            "lr_config.policy", "lr_config.step", "lr_config.min_lr",
            "lr_config.warmup", "lr_config.warmup_iters",
            "optimizer_config.grad_clip.max_norm",
            "model.backbone.type", "model.backbone.depth",
            "model.cls_head.num_classes", "model.cls_head.in_channels")
    mismatches, ref_parse_skips, compared = [], [], 0
    for rp in sorted(glob.glob(osp.join(ref, "**", "*.py"), recursive=True)):
        if "_base_" in rp.split(osp.sep):
            continue
        mp = repo_by_base.get(osp.basename(rp))
        assert mp is not None, f"no same-named repo config for {rp}"
        try:
            rc = Config.fromfile(rp)
        except FileNotFoundError:
            ref_parse_skips.append(osp.basename(rp))
            continue
        mc = Config.fromfile(mp)
        compared += 1
        for key in keys:
            rv, mv = _get(rc, key), _get(mc, key)
            if rv is not None and rv != mv:
                mismatches.append(
                    f"{osp.basename(rp)}: {key} ref={rv!r} repo={mv!r}")
    assert compared > 200, f"only compared {compared} configs"
    assert ref_parse_skips == ["vitclip_zeroI2V_base_sthv2.py"], \
        f"unexpected reference parse skips: {ref_parse_skips}"
    assert not mismatches, "\n".join(mismatches)


def test_delete_marker_never_leaks(tmp_path):
    """_delete_ is a merge directive, not config content: whatever its
    value, it must not survive into the merged dict (a stray
    _delete_=False previously leaked into data dicts)."""
    from adapt_image_models_tpu.config import Config
    base = tmp_path / "base.py"
    base.write_text("d = dict(a=1, sub=dict(x=1))\n")
    child = tmp_path / "child.py"
    child.write_text(
        "_base_ = ['./base.py']\n"
        "d = dict(_delete_=False, b=2, sub=dict(_delete_=True, y=3))\n")
    cfg = Config.fromfile(str(child))
    d = cfg["d"]
    assert "_delete_" not in d and "_delete_" not in d["sub"]
    assert d["a"] == 1 and d["b"] == 2          # False marker -> plain merge
    assert d["sub"] == dict(y=3)                # True marker -> replace

    # markers nested INSIDE a replace branch (and under keys absent from
    # the base) must be stripped recursively too
    child.write_text(
        "_base_ = ['./base.py']\n"
        "d = dict(_delete_=True, sub=dict(_delete_=True, z=4))\n"
        "e = dict(sub=dict(_delete_=True, w=5))\n")
    cfg = Config.fromfile(str(child))
    assert cfg["d"] == dict(sub=dict(z=4))
    assert cfg["e"] == dict(sub=dict(w=5))
