from .preprocess import preprocess_gaussians, quat_scale_to_cov3d  # noqa: F401
from .render_xla import render_gaussians_dense  # noqa: F401
from .render_tiled import render_gaussians_tiled  # noqa: F401
