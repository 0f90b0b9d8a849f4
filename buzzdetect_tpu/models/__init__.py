from buzzdetect_tpu.models.registry import (  # noqa: F401
    BaseModel, BaseEmbedder, BundleModel, EmbedderYamnet,
    load_model, load_embedder)
from buzzdetect_tpu.models.classifier import ChunkClassifier  # noqa: F401
