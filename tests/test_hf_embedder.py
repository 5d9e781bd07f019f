"""Executes ``HuggingFaceEmbedder.embed``'s real mapInPandas body
(E1–E6) end-to-end with a deterministic stand-in model.

The fakes replace only the *weights*: ``AutoModel``/``AutoProcessor``
produce md5-derived activations (3 tokens × 4 dims per input). Every
engine-owned piece runs for real — Arrow batch iteration, per-worker
model construction, ``{mode}: `` prompt prefixing
(``jina_v4_text_indexer.py:104-114`` vs
``jina_v4_text_retrieval.py:48-53``), chunked forward under no_grad,
float32 cast (P7, ``incremental_indexing_colpali_with_qdrant.py:254``),
and the failure-null chunk path (F2 skip-and-count, ``:165-173``).

Workers import the fakes via ``sc.addPyFile`` (a zip on the python
worker path); the driver gets them on ``sys.path`` so the
constructor's availability gate passes. Nothing else in the engine
imports torch worker-side, so the zip staying on the context for the
rest of the session is inert.
"""

import hashlib
import shutil
import sys

import numpy as np
import pytest

FAKE_TORCH = '''\
"""Minimal torch stand-in: just the surface HuggingFaceEmbedder touches."""
import contextlib

float32 = "float32"
bfloat16 = "bfloat16"


class _Cuda:
    @staticmethod
    def is_available():
        return False


cuda = _Cuda()


@contextlib.contextmanager
def no_grad():
    yield
'''

FAKE_TRANSFORMERS = '''\
"""Minimal transformers stand-in: a deterministic md5 'model'.

Activations: value(text, token, dim) = md5(f"{text}|{token}|{dim}")
first 8 hex digits / 0xFFFFFFFF — reproducible driver-side so tests
can assert exact outputs. 3 tokens x 4 dims per input.
"""
import hashlib

import numpy as np

N_TOKENS = 3
DIM = 4


def _val(text, tok, d):
    h = hashlib.md5(f"{text}|{tok}|{d}".encode()).hexdigest()
    return int(h[:8], 16) / float(0xFFFFFFFF)


class Tensor:
    def __init__(self, arr):
        self.arr = np.asarray(arr)

    def to(self, device):
        return self

    def cpu(self):
        return self

    def float(self):
        return self

    def numpy(self):
        return np.asarray(self.arr, dtype=np.float32)

    def mean(self, dim):
        return Tensor(self.arr.mean(axis=dim))


class _TextIds(Tensor):
    def __init__(self, texts):
        super().__init__(np.zeros(len(texts)))
        self.texts = texts


class _Output:
    # deliberately no pooler_output: exercises the mean-pooling branch
    def __init__(self, texts):
        self.last_hidden_state = Tensor(
            [[[_val(t, tok, d) for d in range(DIM)]
              for tok in range(N_TOKENS)] for t in texts]
        )


class _Model:
    def to(self, device):
        return self

    def eval(self):
        return self

    def __call__(self, **inputs):
        return _Output(inputs["input_ids"].texts)


class AutoModel:
    @staticmethod
    def from_pretrained(path, **kw):
        return _Model()


class _Processor:
    def __call__(self, text=None, images=None, **kw):
        items = list(text) if text is not None else list(images)
        for t in items:
            if isinstance(t, str) and "!!corrupt!!" in t:
                raise ValueError("corrupt input")
        return {"input_ids": _TextIds(items)}


class AutoProcessor:
    @staticmethod
    def from_pretrained(path, **kw):
        return _Processor()
'''


def _val(text: str, tok: int, d: int) -> float:
    h = hashlib.md5(f"{text}|{tok}|{d}".encode()).hexdigest()
    return int(h[:8], 16) / float(0xFFFFFFFF)


def _expected_tokens(text: str, mode: str) -> np.ndarray:
    """(3 tokens × 4 dims) float32, matching the fake model exactly."""
    return np.asarray(
        [[_val(f"{mode}: {text}", tok, d) for d in range(4)]
         for tok in range(3)]
    ).astype(np.float32)


# module-scoped: addPyFile registers a file name once per context;
# re-adding the same name from a different tmp dir is an error
@pytest.fixture(scope="module")
def fake_hf(spark, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("fake_hf_pkgs")
    pkgs = tmp_path / "fake_pkgs"
    (pkgs / "torch").mkdir(parents=True)
    (pkgs / "transformers").mkdir()
    (pkgs / "torch" / "__init__.py").write_text(FAKE_TORCH)
    (pkgs / "transformers" / "__init__.py").write_text(FAKE_TRANSFORMERS)
    zip_path = shutil.make_archive(str(tmp_path / "fake_hf"), "zip",
                                   root_dir=pkgs)
    spark.sparkContext.addPyFile(zip_path)  # worker-side import path
    sys.path.insert(0, str(pkgs))           # driver-side gate check
    saved = {}
    for m in list(sys.modules):
        if m.split(".")[0] in ("torch", "transformers"):
            saved[m] = sys.modules.pop(m)
    try:
        yield
    finally:
        sys.path.remove(str(pkgs))
        for m in list(sys.modules):
            if m.split(".")[0] in ("torch", "transformers"):
                del sys.modules[m]
        sys.modules.update(saved)


def _embedder(**kw):
    from image_indexing_and_retrival_with_qdrant_spark.sources.embedder import (
        HuggingFaceEmbedder,
    )

    return HuggingFaceEmbedder("fake/model", **kw)


def test_hf_embed_dense_mean_pool(spark, fake_hf):
    """Dense path: forward → mean over tokens → float32 lists, exact
    against the driver-side reimplementation of the fake model."""
    emb = _embedder(multivector=False, batch_size=2)
    assert emb._available
    rows = [("a", "alpha"), ("b", "beta"), ("c", "gamma")]
    df = spark.createDataFrame(rows, "id string, text string")
    out = {r.id: r.embedding for r in emb.embed(df, mode="passage").collect()}
    assert set(out) == {"a", "b", "c"}
    for i, t in rows:
        exp = _expected_tokens(t, "passage").mean(axis=0)
        assert out[i] == pytest.approx(list(exp), rel=1e-6)


def test_hf_embed_multivector_tokens(spark, fake_hf):
    """Multivector path (ColPali/ColQwen shape): per-token vectors,
    array<array<float>>, exact values."""
    emb = _embedder(multivector=True, batch_size=16)
    df = spark.createDataFrame([("a", "alpha")], "id string, text string")
    res = emb.embed(df, mode="passage").collect()
    vecs = np.asarray(res[0].embedding, dtype=np.float32)
    assert vecs.shape == (3, 4)
    np.testing.assert_allclose(vecs, _expected_tokens("alpha", "passage"),
                               rtol=1e-6)


def test_hf_embed_query_mode_prefix(spark, fake_hf):
    """mode='query' prefixes the prompt, so query vectors differ from
    passage vectors for the same text (E6)."""
    emb = _embedder(multivector=False, batch_size=4)
    df = spark.createDataFrame([("a", "alpha")], "id string, text string")
    p = emb.embed(df, mode="passage").collect()[0].embedding
    q = emb.embed(df, mode="query").collect()[0].embedding
    assert p != q
    exp_q = _expected_tokens("alpha", "query").mean(axis=0)
    assert q == pytest.approx(list(exp_q), rel=1e-6)


def test_hf_embed_failure_nulls_chunk(spark, fake_hf):
    """A corrupt input nulls its forward chunk and never fails the job
    (F2). batch_size=1 isolates the blast radius to the bad row."""
    emb = _embedder(multivector=False, batch_size=1)
    df = spark.createDataFrame(
        [("a", "ok-one"), ("bad", "!!corrupt!!"), ("c", "ok-two")],
        "id string, text string",
    ).coalesce(1)
    out = {r.id: r.embedding for r in emb.embed(df).collect()}
    assert out["bad"] is None
    assert out["a"] is not None and out["c"] is not None
