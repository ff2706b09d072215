from . import resnet, fpn, depthnet  # noqa: F401
