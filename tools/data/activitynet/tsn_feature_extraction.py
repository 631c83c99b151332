#!/usr/bin/env python
"""Extract per-snippet TSN-R50 features from untrimmed ActivityNet rawframe
videos, for BSN/BMN (reference
``tools/data/activitynet/tsn_feature_extraction.py``).

Data list lines: ``frame_dir num_frames output_file``; outputs one
``.pkl`` (T, 2048->num_classes-free feature) per video.
"""

import argparse
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))))

from adapt_image_models_tpu.utils.env import apply_device_override  # noqa: E402
apply_device_override()


def main():
    p = argparse.ArgumentParser(description="Extract TSN Feature")
    p.add_argument("--data-prefix", default="", help="dataset prefix")
    p.add_argument("--output-prefix", default="", help="output prefix")
    p.add_argument("--data-list",
                   help="lines: `frame_dir num_frames output_file`")
    p.add_argument("--frame-interval", type=int, default=16)
    p.add_argument("--modality", default="RGB", choices=["RGB", "Flow"])
    p.add_argument("--ckpt", default=None,
                   help="checkpoint for the feature extractor")
    p.add_argument("--part", type=int, default=0,
                   help="which part of dataset to forward "
                        "(alldata[part::total])")
    p.add_argument("--total", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from adapt_image_models_tpu.core.train_state import as_variables
    from adapt_image_models_tpu.models import build_model
    from adapt_image_models_tpu.data import transforms_host as TH
    from adapt_image_models_tpu.data.transforms import make_prepare_fn
    from adapt_image_models_tpu.data.video_reader import (
        FlowFrameReader, RawFrameReader,
    )

    is_rgb = args.modality == "RGB"
    clip_len = 1 if is_rgb else 5
    norm_cfg = (dict(mean=[123.675, 116.28, 103.53],
                     std=[58.395, 57.12, 57.375], to_bgr=False) if is_rgb
                else dict(mean=[128, 128], std=[128, 128]))
    in_channels = clip_len * (3 if is_rgb else 2)

    prepare = make_prepare_fn(norm_cfg["mean"], norm_cfg["std"])

    # flax convs infer input channels, so the reference's
    # in_channels=clip_len*C needs no backbone field — flow snippets just
    # arrive as (.., clip_len*2, H, W)
    model_cfg = dict(
        type="Recognizer2D",
        backbone=dict(type="ResNet", depth=50),
        cls_head=dict(type="TSNHead", num_classes=200, in_channels=2048),
        test_cfg=dict(average_clips=None))
    model = build_model(model_cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, in_channels, 256, 256)))
    if args.ckpt:
        import torch
        from adapt_image_models_tpu.convert.aim_import import (
            load_aim_checkpoint_into_params,
        )
        ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
        params["params"] = load_aim_checkpoint_into_params(
            params["params"], ckpt, strict=False)

    # per-snippet scores: forward each snippet as its own 1-segment sample
    # (reference: average_clips=None -> no consensus; the BSN/BMN "features"
    # are the 200-d action scores per snippet)
    extract = jax.jit(lambda prm, v: model.apply(as_variables(prm), v))

    data = [x.strip() for x in open(args.data_list)]
    data = data[args.part::args.total]
    os.makedirs(args.output_prefix, exist_ok=True)

    from adapt_image_models_tpu.data.sampling import UntrimmedSampleFrames
    sampler = UntrimmedSampleFrames(clip_len=clip_len,
                                    frame_interval=args.frame_interval,
                                    start_index=0)
    for item in data:
        frame_dir, length, _ = item.split()
        output_file = osp.join(args.output_prefix,
                               osp.basename(frame_dir) + ".pkl")
        frame_dir = osp.join(args.data_prefix, frame_dir)
        if is_rgb:
            reader = RawFrameReader(frame_dir, int(length),
                                    filename_tmpl="img_{:05d}.jpg",
                                    start_index=0)
        else:
            reader = FlowFrameReader(frame_dir, int(length),
                                     filename_tmpl="{}_{:05d}.jpg",
                                     start_index=0)
        inds = sampler(int(length))
        frames = reader.get_frames(inds)
        # host transforms: short-side 256 resize + center crop 256
        frames = TH.rescale_short_side(frames, 256)
        ch = cw = 256
        bbox = TH.center_crop_bbox(frames.shape[1:3], (cw, ch))
        frames = TH.crop_clip(frames, bbox)
        # (num_snippets, clip_len, H, W, C); channels of one snippet stack
        clips = frames.reshape(-1, clip_len, *frames.shape[1:])
        feats = []
        for s in range(0, len(clips), args.batch_size):
            part = clips[None, s:s + args.batch_size]  # (1, S, T, H, W, C)
            x = prepare(jnp.asarray(part))[0]  # (S, C, T, H, W)
            # fold the snippet's frames into channels (reference
            # in_channels = clip_len * C), then snippets act as batch
            x = x.transpose(0, 2, 1, 3, 4).reshape(
                x.shape[0], 1, -1, x.shape[3], x.shape[4])
            feats.append(np.asarray(extract(params, x)))
        feat = np.concatenate(feats)
        with open(output_file, "wb") as f:
            pickle.dump(feat, f)
        print(f"{output_file}: {feat.shape}")


if __name__ == "__main__":
    main()
