from gaitlab.core import geometry  # noqa: F401
