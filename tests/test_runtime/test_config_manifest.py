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
    # unwrap Config (not a dict subclass — starting from the raw object
    # made every lookup None and the comparison vacuous)
    cur = getattr(d, "_cfg_dict", d)
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
            "lr_config.warmup_ratio", "lr_config.warmup_by_epoch",
            "optimizer_config.grad_clip.max_norm",
            "model.backbone.type", "model.backbone.depth",
            "model.backbone.num_frames",
            "model.cls_head.num_classes", "model.cls_head.in_channels",
            "model.cls_head.multi_class", "model.cls_head.loss_cls.type",
            "model.cls_head.dropout_ratio",
            "model.train_cfg.blending.type",
            "model.test_cfg.max_testing_views")
    # documented deviations: places where the reference FILE is wrong about
    # its own dataset and this repo keeps the semantically correct value
    allow = {
        # target_cate='object' copy-paste in the concept recipe: the file
        # trains a 1678-way head on 291-class concept annotations
        ("tsn_r18_1x1x8_100e_hvu_concept_rgb.py",
         "model.cls_head.num_classes"),
        # gym99 recipes never override the base's 400-way head on the
        # 99-class FineGYM data
        ("slowonly_imagenet_pretrained_r50_4x16x1_120e_gym99_rgb.py",
         "model.cls_head.num_classes"),
        ("slowonly_kinetics_pretrained_r50_4x16x1_120e_gym99_flow.py",
         "model.cls_head.num_classes"),
        # the reference file feeds the AIM-only num_tadapter knob into its
        # ViT_CLIP __init__ and crashes as shipped; the intended model (and
        # this repo's) is AIM
        ("vitclip_base_sthv2.py", "model.backbone.type"),
        # this repo's 2D Swin trunk is frame-agnostic (segments fold in the
        # recognizer); the reference's swin2d takes num_frames
        ("swin2d_base_patch4_window7_kinetics400_1k.py",
         "model.backbone.num_frames"),
        ("swin2d_base_patch4_window7_sthv2.py",
         "model.backbone.num_frames"),
    }
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
            if key == "lr_config.step":
                # mmcv accepts both step=7 and step=[7]
                rv = [rv] if isinstance(rv, int) else rv
                mv = [mv] if isinstance(mv, int) else mv
            if (rv is not None and rv != mv
                    and (osp.basename(rp), key) not in allow):
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


# pipeline-geometry projection: per step type, the keys that change what
# the model sees (the 320p recipes shipped Resize(-1, 320) against the
# reference's (-1, 256) and nothing caught it — values below are compared
# for every shared-basename recipe)
_PIPE_KEYS = {
    "SampleFrames": ("clip_len", "frame_interval", "num_clips",
                     "twice_sample", "frame_uniform"),
    "DenseSampleFrames": ("clip_len", "frame_interval", "num_clips",
                          "sample_range", "num_sample_positions"),
    "UntrimmedSampleFrames": ("clip_len", "frame_interval"),
    "SampleAVAFrames": ("clip_len", "frame_interval"),
    "UniformSampleFrames": ("clip_len", "num_clips"),
    "SampleProposalFrames": ("clip_len", "body_segments", "aug_segments",
                             "aug_ratio"),
    "Resize": ("scale", "keep_ratio"),
    "RandomResizedCrop": ("area_range", "aspect_ratio_range"),
    "MultiScaleCrop": ("input_size", "scales", "max_wh_scale_gap",
                       "random_crop", "num_fixed_crops"),
    "RandomCrop": ("size",),
    "CenterCrop": ("crop_size",),
    "ThreeCrop": ("crop_size",),
    "TenCrop": ("crop_size",),
    "Flip": ("flip_ratio", "direction", "flip_label_map"),
    "Imgaug": ("transforms",),
    "Normalize": ("mean", "std", "to_bgr"),
    "FormatShape": ("input_format",),
    "ColorJitter": ("brightness", "contrast", "saturation", "hue"),
    "RandomErasing": ("probability",),
}


def _norm(v):
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


# defaults filled in when a config omits the key (one side writing the
# default explicitly must not read as a mismatch)
_PIPE_DEFAULTS = {
    ("Normalize", "to_bgr"): False,
    ("Resize", "keep_ratio"): True,
    ("Flip", "direction"): "horizontal",
    ("SampleFrames", "num_clips"): 1,
    ("SampleFrames", "frame_interval"): 1,
    ("SampleFrames", "twice_sample"): False,
    ("SampleFrames", "frame_uniform"): False,
    ("UntrimmedSampleFrames", "frame_interval"): 16,
    ("SampleAVAFrames", "frame_interval"): 2,
    ("UniformSampleFrames", "num_clips"): 1,
}


def _pipe_signature(pipeline):
    sig = []
    for step in pipeline or ():
        t = step.get("type")
        if t not in _PIPE_KEYS:
            continue
        if t == "Flip" and not step.get("flip_ratio", 0.5):
            continue  # flip_ratio=0 is a no-op step (reference writes it)
        kv = []
        for k in _PIPE_KEYS[t]:
            if (t, k) == ("Resize", "keep_ratio") and isinstance(
                    step.get("scale"), (tuple, list)) and -1 not in tuple(
                    step["scale"]):
                # documented equivalence: the repo's compiled pipeline
                # resizes fixed (W, H) scales exactly (static shapes);
                # the reference's keep_ratio=True max-bound rescale
                # differs by <=1 px on the standard prepared sources
                continue
            v = step.get(k, _PIPE_DEFAULTS.get((t, k)))
            if v is not None:
                kv.append((k, _norm(v)))
        sig.append((t, tuple(kv)))
    return sig


def test_reference_config_pipeline_fidelity():
    """Shared-basename recipes must carry the REFERENCE's pipeline
    geometry: sampling, resize scales, crop sizes/areas, flip ratio,
    normalization, FormatShape — projected per step type and compared for
    all three splits."""
    from adapt_image_models_tpu.config import Config
    ref = "/root/reference/configs"
    if not osp.isdir(ref):
        import pytest
        pytest.skip("reference tree not available")
    repo_by_base = {}
    for p in glob.glob(osp.join(REPO, "configs", "**", "*.py"),
                       recursive=True):
        repo_by_base.setdefault(osp.basename(p), p)
    mismatches, compared = [], 0
    for rp in sorted(glob.glob(osp.join(ref, "**", "*.py"), recursive=True)):
        if "_base_" in rp.split(osp.sep):
            continue
        try:
            rc = Config.fromfile(rp)
        except FileNotFoundError:
            continue  # the known broken-_base_ reference file
        mc = Config.fromfile(repo_by_base[osp.basename(rp)])
        for split in ("train", "val", "test"):
            r_ds = (rc.get("data") or {}).get(split)
            m_ds = (mc.get("data") or {}).get(split)
            if not isinstance(r_ds, dict) or not isinstance(m_ds, dict):
                continue
            rs = _pipe_signature(r_ds.get("pipeline"))
            ms = _pipe_signature(m_ds.get("pipeline"))
            if not any(t == "Normalize" for t, _ in rs):
                # reference recipes that normalize in the MODEL
                # (GPUNormalize, vitclip_base_diving48.py:13) carry no
                # pipeline Normalize; this repo always normalizes in the
                # jitted device stage and documents the stats as an
                # explicit pipeline step — same place, same math
                ms = [s for s in ms if s[0] != "Normalize"]
            if rs != ms:
                diff = [f"  ref : {a}\n  repo: {b}"
                        for a, b in zip(rs, ms) if a != b]
                if len(rs) != len(ms):
                    diff.append(f"  step counts {len(rs)} vs {len(ms)}")
                mismatches.append(
                    f"{osp.basename(rp)}[{split}]:\n" + "\n".join(diff))
            compared += 1
    assert compared > 500, f"only compared {compared} split pipelines"
    assert not mismatches, (f"{len(mismatches)} pipeline mismatches:\n"
                            + "\n".join(mismatches[:20]))
