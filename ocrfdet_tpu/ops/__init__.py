from .bev_pool import bev_pool_lss, bev_pool_scatter_weights  # noqa: F401
from .grid_sample import grid_sample_2d, bilinear_sample  # noqa: F401
