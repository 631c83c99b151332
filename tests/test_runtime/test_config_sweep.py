"""Config sweep (reference tests/test_runtime/test_config.py:26-45):
load EVERY config under configs/, build its model at tiny-compatible
settings where possible, and compile the pipelines — catches registry/config
drift without touching weights or data."""

import glob
import os

import pytest

import jax
import jax.numpy as jnp

from adapt_image_models_tpu.config import Config
from adapt_image_models_tpu.models import build_model
from adapt_image_models_tpu.data.pipeline import build_sample_processor

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.py"),
                         recursive=True)
    if os.sep + "_base_" + os.sep not in p)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_loads_and_builds(path):
    cfg = Config.fromfile(path)
    if cfg.get("model") is None:
        # tool-stage recipes (reference bsn_pgm) carry no model: they
        # parameterize a CLI stage instead
        assert "pgm_proposals_cfg" in cfg
        return
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    train_cfg = model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, train_cfg=train_cfg, test_cfg=test_cfg)
    assert model is not None
    # flax setup() is lazy — constructor-validate the sub-module configs
    # (unknown kwargs otherwise surface only at init/apply time)
    from adapt_image_models_tpu.models.builder import (
        build_backbone, build_head, build_neck,
    )
    if "backbone" in model_cfg:
        assert build_backbone(dict(model_cfg["backbone"])) is not None
    head_key = "cls_head" if "cls_head" in model_cfg else None
    if head_key:
        assert build_head(dict(model_cfg[head_key])) is not None
    if model_cfg.get("neck"):
        assert build_neck(dict(model_cfg["neck"])) is not None
    if "roi_head" in model_cfg:  # detectors mirror FastRCNN.setup
        from adapt_image_models_tpu.models.builder import HEADS
        from adapt_image_models_tpu.models.roi_extractors.single_straight3d import (
            SingleRoIExtractor3D,
        )
        rh = model_cfg["roi_head"]
        ec = dict(rh["bbox_roi_extractor"])
        ec.pop("type", None)
        SingleRoIExtractor3D(**ec)
        hc = dict(rh["bbox_head"])
        hc.pop("type", None)
        HEADS.get("BBoxHeadAVA")(**hc)
        if rh.get("shared_head"):
            sc = dict(rh["shared_head"])
            st = sc.pop("type")
            if st == "FBOHead":
                sc.pop("lfb_cfg", None)
            HEADS.get(st)(**sc)

    # all three pipelines must compile and agree on a static output size
    for split in ("train", "val", "test"):
        # None = split removed by a child config (infer/test-only recipes)
        if cfg["data"].get(split) is None:
            continue
        split_cfgs = cfg["data"][split]
        # OmniSource recipes train over a list of sources
        if not isinstance(split_cfgs, (list, tuple)):
            split_cfgs = [split_cfgs]
        for ds_cfg in split_cfgs:
            _check_split(ds_cfg)

    # recipe fields used by the trainer must be present and well-formed —
    # except for test/inference-only recipes (reference *_inference_*,
    # lfb infer, bsn pgm), which carry no train split and no optimizer
    if cfg.get("data", {}).get("train") is not None:
        assert cfg.get("optimizer") and "lr" in cfg["optimizer"]
        assert (cfg.get("total_epochs") or 1) >= 1

    # model/pipeline frame-count consistency: a 3D backbone that declares
    # num_frames must match the train sampling (vitclip_base_k700 once
    # sampled 8 frames into a 32-frame temporal embedding -> crash)
    bb = model_cfg.get("backbone") or {}
    nf = bb.get("num_frames")
    tr = cfg.get("data", {}).get("train")
    if nf and isinstance(tr, dict):
        pipe = tr.get("pipeline") or ()
        sf = next((s for s in pipe if s.get("type") == "SampleFrames"), None)
        fmt = next((s.get("input_format") for s in pipe
                    if s.get("type") == "FormatShape"), None)
        if sf is not None and fmt == "NCTHW":
            assert sf["clip_len"] == nf, (
                f"backbone num_frames={nf} but train clip_len="
                f"{sf['clip_len']}")


def _check_split(ds_cfg):
    pipeline = ds_cfg["pipeline"]
    ds_type = ds_cfg.get("type")
    if ds_type == "AVADataset":
        # detection datasets own their (box-aware) pipeline; validate
        # the sampling step is present instead
        assert any(s["type"] == "SampleAVAFrames" for s in pipeline)
        return
    if ds_type == "PoseDataset":
        # pose datasets compile their own coordinate/heatmap processor
        from adapt_image_models_tpu.data.pose import PoseSampleProcessor
        proc = PoseSampleProcessor(pipeline)
        h, w = proc.output_size()
        assert h > 0 and w > 0 and proc.num_views >= 1
        return
    if ds_type == "ActivityNetDataset":
        # feature-based localization: no spatial pipeline; validate the
        # load step is present instead
        assert any(s["type"] in ("LoadLocalizationFeature",
                                 "LoadProposals") for s in pipeline)
        return
    if ds_type == "SSNDataset":
        assert any(s["type"] == "SampleProposalFrames" for s in pipeline)
        return
    if ds_type in ("AudioDataset", "AudioFeatureDataset"):
        from adapt_image_models_tpu.data.audio import AudioSampleProcessor
        proc = AudioSampleProcessor(pipeline)
        assert proc.sampler is not None
        return
    proc = build_sample_processor(pipeline)
    h, w = proc.output_size()
    assert h > 0 and w > 0
    # UntrimmedSampleFrames recipes have video-dependent view counts (None)
    assert proc.num_views is None or proc.num_views >= 1


@pytest.mark.parametrize("path", [p for p in CONFIGS if "debug_tiny" in p])
def test_tiny_config_model_forward(path):
    """The debug config must actually run a forward pass."""
    cfg = Config.fromfile(path)
    model_cfg = dict(cfg["model"])
    test_cfg = model_cfg.pop("test_cfg", None)
    model_cfg.pop("train_cfg", None)
    model = build_model(model_cfg, test_cfg=test_cfg)
    bb = model_cfg["backbone"]
    x = jnp.zeros((1, 3, bb["num_frames"], bb["input_resolution"],
                   bb["input_resolution"]))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape[0] == 1


def test_every_video_pipeline_executes_on_synthetic_sample():
    """Beyond compiling (the sweep above), every video/rawframe recipe's
    pipeline must RUN: one synthetic sample through each compiled
    processor, output contract (V, T, H, W, 3) uint8 at the processor's
    own advertised geometry. Catches step combinations that build but
    fail on data (one pytest item to keep the suite's wall time flat)."""
    import numpy as np

    def leaf_dataset(ds_cfg):
        ds_cfg = dict(ds_cfg)
        while ds_cfg.get("type") in ("RepeatDataset",):
            ds_cfg = dict(ds_cfg["dataset"])
        return ds_cfg

    failures, ran, seen = [], 0, set()
    for path in CONFIGS:
        cfg = Config.fromfile(path)
        if cfg.get("model") is None or cfg.get("data") is None:
            continue
        for split in ("train", "val", "test"):
            split_cfgs = cfg["data"].get(split)
            if split_cfgs is None:
                continue
            if not isinstance(split_cfgs, (list, tuple)):
                split_cfgs = [split_cfgs]
            for raw_cfg in split_cfgs:
                ds_cfg = leaf_dataset(raw_cfg)
                dtype = ds_cfg.get("type")
                if dtype == "PoseDataset":
                    key = ("pose", repr(ds_cfg["pipeline"]), split)
                    if key in seen:
                        continue
                    seen.add(key)
                    try:
                        from adapt_image_models_tpu.data.pose import (
                            PoseSampleProcessor,
                        )
                        pproc = PoseSampleProcessor(ds_cfg["pipeline"])
                        prng = np.random.default_rng(0)
                        heat, _ = pproc(dict(
                            total_frames=12, label=1, img_shape=(64, 64),
                            keypoint=prng.uniform(
                                8, 56, (1, 12, 17, 2)).astype(np.float32),
                            keypoint_score=prng.uniform(
                                size=(1, 12, 17)).astype(np.float32)), prng)
                        assert np.isfinite(heat).all() and heat.ndim >= 4
                        ran += 1
                    except Exception as e:  # noqa: BLE001
                        failures.append(
                            f"{os.path.basename(path)}[{split}]: {e!r}")
                    continue
                if dtype == "AudioFeatureDataset":
                    key = ("audio", repr(ds_cfg["pipeline"]), split)
                    if key in seen:
                        continue
                    seen.add(key)
                    try:
                        from adapt_image_models_tpu.data.audio import (
                            AudioSampleProcessor,
                        )
                        aproc = AudioSampleProcessor(ds_cfg["pipeline"])
                        out = aproc(dict(
                            total_frames=200, label=1,
                            audio_path="/nonexistent/a.npy"),
                            np.random.default_rng(0))  # (S, 1, T, F)
                        assert out.ndim == 4 and np.isfinite(out).all()
                        ran += 1
                    except Exception as e:  # noqa: BLE001
                        failures.append(
                            f"{os.path.basename(path)}[{split}]: {e!r}")
                    continue
                if dtype not in ("VideoDataset", "RawframeDataset"):
                    continue
                pipeline = ds_cfg["pipeline"]
                fmts = [s.get("input_format", "") for s in pipeline
                        if s.get("type") == "FormatShape"]
                if any("Flow" in f for f in fmts):
                    continue  # flow needs 2-channel frame dirs
                if ds_cfg.get("modality") == "Flow":
                    continue
                # many recipes share a pipeline verbatim: execute each
                # unique (pipeline, mode) once
                key = (repr(pipeline), split != "train")
                if key in seen:
                    continue
                seen.add(key)
                try:
                    proc = build_sample_processor(
                        pipeline, test_mode=(split != "train"))
                    clips, label = proc("synthetic://1", label=3,
                                        rng=np.random.default_rng(0),
                                        total_frames=64)
                    h, w = proc.output_size()
                    assert clips.dtype == np.uint8, clips.dtype
                    assert clips.shape[-3:] == (h, w, 3), \
                        (clips.shape, (h, w))
                    assert clips.shape[1] == proc.sampler.clip_len, \
                        (clips.shape, proc.sampler.clip_len)
                    if proc.num_views is not None:
                        assert clips.shape[0] == proc.num_views, \
                            (clips.shape, proc.num_views)
                    ran += 1
                except Exception as e:  # noqa: BLE001 — aggregate report
                    failures.append(
                        f"{os.path.basename(path)}[{split}]: {e!r}")
    assert ran > 100, f"only {ran} unique pipelines executed"
    assert not failures, "\n".join(failures[:25])
