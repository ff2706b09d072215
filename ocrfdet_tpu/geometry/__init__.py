from . import quaternion, transforms, frustum, cameras  # noqa: F401
