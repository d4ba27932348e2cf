from .scalars import davg, dsum  # noqa: F401
