# Canonical AIM (paper model) ViT-B/16, K400, 32x3x1 — repo-only recipe.
# The fork's same-named vitclip_base_k400.py builds its experimental
# ViT_CLIP variant (reference _base_/models/vitclip_base.py); upstream
# AIM's published K400 results (README.md:90-92) come from the canonical
# adapter block, which the fork preserves as backbone type AIM
# (vitclip_aim.py:341). This recipe is that model on the same schedule,
# and is the train-benchmark target for the 32-frame flagship rows in
# docs/benchmark.md.
_base_ = ["./vitclip_base_k400.py"]

model = dict(backbone=dict(type="AIM"))
work_dir = "./work_dirs/aim_base_k400"
