"""Embedder seam (SURVEY.md §2.6 E1–E6).

The reference's entire scalar-function library is batched model
inference: ColPali/ColQwen2/Jina multivector image embedding, VDR/Jina
dense embedding, plus query-mode variants
(``incremental_indexing_colpali_with_qdrant.py:89-104,245-248``,
``jina_v4_text_indexer.py:104-114``, ``query_vdr_2b_multi_v1.py:64-75``).
Engine decision (SURVEY.md §2.6): the embedder is a pluggable
interface with

- ``HashEmbedder`` — deterministic, model-free, **pure Catalyst
  expression** (no Python): dim i of the vector is the portable
  60-bit md5 hash of ``text || ':' || i`` mapped to [-1, 1]. Exactly
  SQL-expressible, so the whole ingest pipeline is oracle-checkable.
- ``PandasHashEmbedder`` — the same function computed in a
  ``mapInPandas`` iterator UDF. Produces bit-identical vectors; its
  purpose is to exercise the *real* model-UDF shape (stateful
  per-worker init, Arrow batch iteration) so swapping in a GPU model
  changes one method, not the pipeline.
- ``HuggingFaceEmbedder`` — the real-model adapter, gated behind an
  import-try (torch/transformers are not in this container; mirrors
  the reference's ``local_files_only=True`` offline loading,
  ``README.md:138``).

Mode ∈ {passage, query} mirrors the reference's prompt-mode split
(``jina_v4_text_indexer.py:104-114`` vs ``jina_v4_text_retrieval.py:48-53``).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash64
from ..functions.vector import l2_normalize

__all__ = ["HashEmbedder", "PandasHashEmbedder", "HuggingFaceEmbedder"]

_MOD = 2_000_001
_HALF = 1_000_000


class HashEmbedder:
    """Deterministic stub embedder as a JVM-side expression."""

    def __init__(self, dim: int = 8, normalize: bool = False):
        self.dim = dim
        self.normalize = normalize

    def expr(self, text: Column, mode: str = "passage") -> Column:
        tagged = text if mode == "passage" else F.concat(F.lit("query:"), text)
        vec = F.array(
            *[
                (
                    (hash64(F.concat(tagged, F.lit(f":{i}"))) % _MOD - _HALF)
                    / F.lit(float(_HALF))
                )
                for i in range(self.dim)
            ]
        )
        return l2_normalize(vec) if self.normalize else vec

    def _expr_sql(self, text_sql: str, mode: str = "passage") -> str:
        """One JVM-parsed SQL string for the whole vector — the exact
        expression tree :meth:`expr` builds (conv/substring/md5 int
        math, INT literals, ``1000000.0D`` divide), but ~5 py4j round
        trips instead of ~5·dim Column ops (the functions/vector.py
        operand discipline; measured ~560 commands per corpus embed at
        dim 8)."""
        tagged = (text_sql if mode == "passage"
                  else f"concat('query:', {text_sql})")
        dims = ", ".join(
            f"(CAST(conv(substring(md5(concat({tagged}, ':{i}')), 1, 15), "
            f"16, 10) AS BIGINT) % {_MOD} - {_HALF}) / {float(_HALF)!r}D"
            for i in range(self.dim))
        return f"array({dims})"

    def embed(self, df: DataFrame, text_col: str = "text",
              out_col: str = "embedding", mode: str = "passage") -> DataFrame:
        vec = F.expr(self._expr_sql(f"`{text_col}`", mode))
        if self.normalize:
            vec = l2_normalize(vec)
        return df.withColumn(out_col, vec)

    def embed_local(self, texts: list[str],
                    mode: str = "passage") -> list[list[float]]:
        """Driver-side twin of :meth:`expr` for LITERAL query texts —
        bit-identical float64 vectors without a Spark job. The query
        paths previously embedded one literal string by building a
        local DataFrame and collecting it: a whole Spark action (plan
        analysis + a Python-RDD scan task) to md5 a few bytes. The
        arithmetic is the same portable 60-bit hash (md5 hex[0:15] →
        int, non-negative, so Spark's long ``%`` ≡ Python's), the same
        ``% _MOD - _HALF`` int math, and the same int/float64 divide;
        the normalize branch mirrors ``l2_normalize`` exactly (one
        left-to-right ``0.0 + x²`` fold, sqrt, per-element divide).
        Parity is pinned by tests/test_ingest.py."""
        prefix = "" if mode == "passage" else "query:"
        out = []
        for t in texts:
            vec = [
                (int(hashlib.md5(f"{prefix}{t}:{i}".encode())
                     .hexdigest()[:15], 16) % _MOD - _HALF) / float(_HALF)
                for i in range(self.dim)
            ]
            if self.normalize:
                acc = 0.0
                for x in vec:
                    acc = acc + x * x
                n = math.sqrt(acc)  # correctly-rounded IEEE sqrt,
                # same bits as the JVM's Math.sqrt (pow(x,0.5) is not
                # guaranteed exact on every libm)
                vec = [x / n for x in vec]
            out.append(vec)
        return out

    def oracle_dim_sql(self, i: int, text_expr: str = "text",
                       mode: str = "passage") -> str:
        """DuckDB fragment computing dimension ``i`` (for oracles)."""
        tagged = text_expr if mode == "passage" else f"('query:' || {text_expr})"
        h = f"CAST(('0x' || substr(md5({tagged} || ':{i}'), 1, 15)) AS BIGINT)"
        return f"(({h} % {_MOD}) - {_HALF}) / {float(_HALF)}"


class PandasHashEmbedder:
    """Same stub via mapInPandas — the production model-UDF shape."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def embed(self, df: DataFrame, text_col: str = "text",
              out_col: str = "embedding", mode: str = "passage") -> DataFrame:
        dim = self.dim
        fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)
        schema = f"{fields}, {out_col} array<double>"
        prefix = "" if mode == "passage" else "query:"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # Model init would happen here, once per worker (the
            # reference loads its model once per process,
            # incremental_indexing_colpali_with_qdrant.py:89-104).
            def vec(text: str) -> list[float]:
                out = np.empty(dim, dtype=np.float64)
                for i in range(dim):
                    h = hashlib.md5(f"{prefix}{text}:{i}".encode()).hexdigest()
                    out[i] = (int(h[:15], 16) % _MOD - _HALF) / float(_HALF)
                return out.tolist()

            for pdf in batches:
                pdf = pdf.copy()
                pdf[out_col] = pdf[text_col].map(vec)
                yield pdf

        return df.mapInPandas(run, schema=schema)


class HuggingFaceEmbedder:
    """Real-model adapter (E1–E6). Requires torch + transformers with
    locally cached weights (absent from this container — the embed
    call is gated with a clear error until they exist; the UDF body
    below is the real implementation, not a placeholder).

    Parameters mirror the reference: model id/path, multivector flag
    (ColPali/ColQwen2/Jina-image → list of per-token vectors),
    device/dtype selection
    (``incremental_indexing_colpali_with_qdrant.py:81-85``: bf16 on
    CUDA, f32 on CPU), batch size
    (``:311`` → 16 for multivector image models), offline loading
    (``local_files_only=True``, ``README.md:138``), and the
    passage/query prompt-mode split
    (``jina_v4_text_indexer.py:104-114`` vs
    ``jina_v4_text_retrieval.py:48-53``).
    """

    def __init__(self, model_path: str, multivector: bool = False,
                 batch_size: int = 16, is_image: bool = False):
        self.model_path = model_path
        self.multivector = multivector
        self.batch_size = batch_size
        self.is_image = is_image
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
            self._available = True
        except ImportError:
            self._available = False

    def embed(self, df: DataFrame, text_col: str = "text",
              out_col: str = "embedding", mode: str = "passage") -> DataFrame:
        """scan → Arrow batches → per-worker model singleton → forward
        under no_grad → float32 lists (P7 dtype normalization,
        ``incremental_indexing_colpali_with_qdrant.py:254``).

        Corrupt inputs yield null embeddings (F2 skip-and-count,
        ``:165-173``) — the job never fails on one bad row."""
        if not self._available:
            raise NotImplementedError(
                "torch/transformers not installed — use HashEmbedder or "
                "PandasHashEmbedder for engine testing (SURVEY.md §2.6)"
            )

        model_path = self.model_path
        multivector = self.multivector
        batch_size = self.batch_size
        is_image = self.is_image
        vec_type = "array<array<float>>" if multivector else "array<float>"
        fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)
        schema = f"{fields}, {out_col} {vec_type}"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import torch
            from transformers import AutoModel, AutoProcessor

            device = "cuda" if torch.cuda.is_available() else "cpu"
            dtype = torch.bfloat16 if device == "cuda" else torch.float32
            # one model per python worker; workers are reused across
            # tasks so this amortizes like the reference's per-process
            # load (incremental_indexing_colpali_with_qdrant.py:89-104)
            model = AutoModel.from_pretrained(
                model_path, torch_dtype=dtype, local_files_only=True,
                trust_remote_code=True,
            ).to(device).eval()
            processor = AutoProcessor.from_pretrained(
                model_path, local_files_only=True, trust_remote_code=True
            )

            def forward(items: list):
                with torch.no_grad():
                    if is_image:
                        import io

                        from PIL import Image

                        imgs = [Image.open(io.BytesIO(b)).convert("RGB")
                                for b in items]
                        inputs = processor(images=imgs, return_tensors="pt")
                    else:
                        inputs = processor(
                            text=[f"{mode}: {t}" for t in items],
                            return_tensors="pt", padding=True, truncation=True,
                        )
                    inputs = {k: v.to(device) for k, v in inputs.items()}
                    out = model(**inputs)
                    emb = out.last_hidden_state if multivector else (
                        out.pooler_output if hasattr(out, "pooler_output")
                        else out.last_hidden_state.mean(dim=1)
                    )
                    emb = emb.cpu().float().numpy()  # P7 normalization
                return [e.tolist() for e in emb]

            for pdf in batches:
                pdf = pdf.copy()
                vecs = []
                items = pdf[text_col].tolist()
                for i in range(0, len(items), batch_size):
                    chunk = items[i:i + batch_size]
                    try:
                        vecs.extend(forward(chunk))
                    except Exception:
                        # permissive: null rows for the failed chunk
                        vecs.extend([None] * len(chunk))
                pdf[out_col] = vecs
                yield pdf

        return df.mapInPandas(run, schema=schema)
