"""Environment-driven configuration (SURVEY.md §2.8).

The reference configures everything via ``.env``
(``/root/reference/.env-example:1-48``: server host/port, model paths,
collection names, data folders, batch sizes). The engine keeps the
same pattern with Spark-appropriate variables; where a reference
variable has a direct analog the name is kept recognizable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass
class EngineConfig:
    # storage root for collections (analog of the Qdrant server URL,
    # .env-example:7-8 QDRANT_HOST/QDRANT_PORT)
    collection_root: str = field(
        default_factory=lambda: _env("ENGINE_COLLECTION_ROOT", "./collections")
    )
    # default collection name (.env-example:20,27,34 *_annual_report)
    collection_name: str = field(
        default_factory=lambda: _env("ENGINE_COLLECTION_NAME", "documents")
    )
    # input data folder (.env-example DATA_FOLDER analogs)
    data_folder: str = field(
        default_factory=lambda: _env("ENGINE_DATA_FOLDER", "./data")
    )
    # embedding model path; empty → deterministic stub embedder
    # (MODEL_PATH / local_files_only pattern, README.md:138)
    model_path: str = field(default_factory=lambda: _env("ENGINE_MODEL_PATH", ""))
    embed_dim: int = field(
        default_factory=lambda: int(_env("ENGINE_EMBED_DIM", "64"))
    )
    # Arrow batch size ≙ reference inference batch size
    # (incremental_indexing_colpali_with_qdrant.py:311 → 16)
    batch_size: int = field(
        default_factory=lambda: int(_env("ENGINE_BATCH_SIZE", "4096"))
    )
    top_k: int = field(default_factory=lambda: int(_env("ENGINE_TOP_K", "5")))

    def embedder(self):
        from .sources.embedder import HashEmbedder, HuggingFaceEmbedder

        if self.model_path:
            return HuggingFaceEmbedder(self.model_path)
        return HashEmbedder(dim=self.embed_dim)
