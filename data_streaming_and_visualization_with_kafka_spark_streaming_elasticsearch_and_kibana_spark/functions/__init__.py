from . import codecs, text, vectors  # noqa: F401
