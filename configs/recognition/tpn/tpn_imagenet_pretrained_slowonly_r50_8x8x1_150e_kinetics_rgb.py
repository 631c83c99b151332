# tpn_imagenet_pretrained_slowonly_r50_8x8x1_150e_kinetics_rgb (parity: reference configs/recognition/tpn/tpn_imagenet_pretrained_slowonly_r50_8x8x1_150e_kinetics_rgb.py)
_base_ = "./tpn_slowonly_r50_8x8x1_150e_kinetics_rgb.py"

model = dict(backbone=dict(pretrained="torchvision://resnet50",
                           pretrained2d=True))
work_dir = "./work_dirs/tpn_imagenet_pretrained_slowonly_r50_8x8x1_150e_kinetics_rgb"
