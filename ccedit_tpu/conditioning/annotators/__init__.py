from .base import AnnotatorEmbedder, build_annotator  # noqa: F401
