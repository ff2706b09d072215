from .vma import match_vma  # noqa: F401
