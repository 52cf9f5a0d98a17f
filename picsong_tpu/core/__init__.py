from . import header, image_io, lut, spec  # noqa: F401
