from . import se3, so3, sim3  # noqa: F401
