"""Frozen dataclass configuration.

Covers the reference's full flag set (``parameters.py:5-62``) with the same
knob names for familiarity, plus TPU-native additions (mesh shape, dtypes,
title source format). The reference threads a flat argparse namespace through
every layer; here the config is an immutable dataclass so it can be closed
over by jitted functions safely.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Config:
    # ---- model family (reference parameters.py:38) -------------------------
    model: str = "NRMS"  # registry key: "NRMS" | "NAML"

    # How news titles enter the news encoder:
    #   "word_ids"  — (num_news+1, num_words_title) int matrix of word-vocab
    #                 ids feeding a word-embedding table (upstream/GloVe
    #                 format; what the README numbers were produced with).
    #   "doc_table" — (num_news+1, 1) doc-index pointer into a precomputed
    #                 frozen per-title embedding table of shape
    #                 (num_news+1, num_words_title*word_embedding_dim)
    #                 (the fork's BPEmb/BERT format, preprocess.py:64-65).
    # The reference hardwires NRMS to word_ids and NAML to doc_table (and the
    # NRMS path is broken as written, SURVEY.md §5 defect 1); here both models
    # accept both formats.
    title_source: str = "word_ids"

    # ---- model dims (reference parameters.py:42-59) ------------------------
    num_words_title: int = 20
    num_words_abstract: int = 50  # parsed, unused downstream (parity with ref)
    user_log_length: int = 50
    word_embedding_dim: int = 300  # glove 300 / bpemb 300 / bert 768
    news_dim: int = 400
    news_query_vector_dim: int = 200
    user_query_vector_dim: int = 200
    num_attention_heads: int = 20
    category_emb_dim: int = 100
    use_category: bool = False
    use_subcategory: bool = False
    user_log_mask: bool = False
    drop_rate: float = 0.2
    freeze_embedding: bool = False

    # ---- training (reference parameters.py:32-40,52-56) --------------------
    batch_size: int = 32  # per data-parallel shard, like the reference's per-GPU bs
    npratio: int = 4
    epochs: int = 1
    lr: float = 1e-4
    seed: int = 0
    start_epoch: int = 0
    log_steps: int = 100
    save_steps: int = 10000
    filter_num: int = 3  # min word count for the word vocab (ref parameters.py:35)

    # ---- paths / modes (reference parameters.py:15-31,56) ------------------
    mode: str = "train"  # train | test | train_test | create_embeddings | read_embeddings | serve
    prepare: bool = True
    train_data_dir: str = "data/MINDsmall_train"
    test_data_dir: str = "data/MINDsmall_dev"
    model_dir: str = "model"
    load_ckpt_name: Optional[str] = None
    glove_embedding_path: Optional[str] = None
    # Precomputed-title-table backend for --mode create_embeddings:
    # "bpemb" (the reference demo's multilingual BPEmb, preprocess.py:112-168),
    # "bert" (last-4-layer sum, preprocess.py:170-225), or "hash"
    # (dependency-free deterministic fallback for offline environments).
    embedding_backend: str = "bpemb"
    # Title tokenizer: "treebank" = NLTK-faithful word_tokenize(lower())
    # (the upstream vocab the README numbers depend on, preprocess.py:29-30);
    # "regex" = fast approximation.
    tokenizer: str = "treebank"

    # ---- TPU-native knobs (no reference equivalent) ------------------------
    # Mesh: data-parallel axis x table-sharding axis. data_parallel=0 means
    # "use all available devices on the data axis".
    data_parallel: int = 0
    table_shards: int = 1  # >1 row-shards embedding tables over a 'table' mesh axis
    compute_dtype: str = "float32"  # "bfloat16" activations on TPU; f32 params
    param_dtype: str = "float32"
    eval_batch_size: int = 128
    eval_news_chunk: int = 1024  # corpus chunk for news-vector precompute
    # k>1: scan k eval batches per device dispatch (amortizes per-dispatch
    # transport overhead — measured ~6 ms/dispatch on the remote-TPU
    # tunnel, round 5); leftovers run the single-batch program
    eval_steps_per_call: int = 8
    max_candidates: int = 384  # impression padding width at eval (MIND dev max ~300)
    donate_state: bool = True
    steps_per_call: int = 1  # k>1: lax.scan k optimizer steps per dispatch
    # Host batches staged ahead of the device by a background thread
    # (train/prefetch.py): batch gather + device_put for step N+1 overlap
    # the device executing step N. 0 disables (inline host path).
    prefetch_depth: int = 2
    # Keep news_features resident on device and gather feature rows inside
    # the train step; the host ships only (B, L) int32 news indices per
    # step (~20x fewer wire bytes than the gathered (B, L, F) rows).
    device_gather: bool = True
    use_pallas: str = "auto"  # "auto" | "on" | "off" — Pallas kernels for hot ops
    fused_tail: str = "auto"  # "auto" | "on" | "off" — fused MHSA+pool kernel
    attention_layout: str = "headloop"  # "headloop" | "blanes" in-kernel layout
    # Attention-backward residuals: "recompute" re-derives the scores in the
    # bwd kernel; "probs" (default) saves the f32 attention probs in the fwd
    # and skips the recompute (bit-identical grads, measured faster —
    # docs/PERF.md round 3).
    bwd_residuals: str = "probs"
    # ---- serving (--mode serve; server.py) ---------------------------------
    serve_host: str = "127.0.0.1"
    serve_port: int = 8000
    serve_max_batch: int = 128     # micro-batching coalescing cap
    # Max wait to fill a device batch. Re-tuned in round 4 for the
    # pipelined dispatcher (serve_pipeline_depth 2): the round-3 5 ms/64
    # point was optimal for the SYNCHRONOUS worker, whose device round
    # trip acted as an implicit extra collection window. With dispatch
    # and completion overlapped, 15 ms/128 dominates every measured axis
    # at 64 clients (479 vs 352 req/s sync same-day, p50 128 vs 149 ms,
    # p99 199 vs 231 ms) and scales to 512 req/s at 128 clients
    # (BASELINE.md round-4 serving table).
    serve_max_delay_ms: float = 15.0
    # Device batches in flight between the coalescing worker and the
    # result-fetch completer (server.py BatchingScorer): collection and
    # request encoding for batch N+1 overlap batch N's device round trip.
    # 0 = synchronous dispatch (the pre-pipeline behavior).
    serve_pipeline_depth: int = 2
    # Candidate scorer for serving. "dense" scores the WHOLE corpus cache
    # with one matmul then gathers the candidates; "gather" random-gathers
    # only the candidate rows. Round-4 device-level sweep
    # (tools/bench_scorer_crossover.py, B=512, C=300, f32, one v5e chip):
    #   rows     gather       dense
    #   65,536   62.8k/s      107.5k/s   (dense +71%)
    #   262,144  58.0k/s       73.1k/s   (dense +26%)
    #   1,048,576 38.5k/s      35.8k/s   (gather +7%)
    # log-interpolated crossover ~750k rows. "auto" (default) picks dense
    # while the cache has <= serve_dense_max_rows rows, else gather.
    serve_scorer: str = "auto"
    serve_dense_max_rows: int = 524288  # "auto" flips to gather above this
    serve_cache_dtype: str = "float32"  # "bfloat16" halves cache HBM traffic
    deterministic: bool = False  # disable dropout everywhere (test/debug mode)
    debug_nans: bool = False  # jax_debug_nans: fail fast on NaN/Inf
    profile_dir: Optional[str] = None  # jax.profiler trace output dir

    # ---- legacy/compat flags kept for CLI familiarity ----------------------
    nGPU: int = 1  # reference's device count; mapped onto the data axis
    enable_gpu: bool = True  # ignored (accelerator use is implicit in JAX)

    def __post_init__(self):
        if self.model not in ("NRMS", "NAML"):
            raise ValueError(f"unknown model {self.model!r}")
        if self.title_source not in ("word_ids", "doc_table"):
            raise ValueError(f"unknown title_source {self.title_source!r}")
        if self.news_dim % self.num_attention_heads != 0:
            # reference asserts the same (NRMS.py:14)
            raise ValueError(
                f"news_dim {self.news_dim} not divisible by "
                f"num_attention_heads {self.num_attention_heads}"
            )
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown compute_dtype {self.compute_dtype!r}")
        if self.use_pallas not in ("auto", "on", "off"):
            raise ValueError(f"unknown use_pallas {self.use_pallas!r}")
        if self.fused_tail not in ("auto", "on", "off"):
            raise ValueError(f"unknown fused_tail {self.fused_tail!r}")
        if self.attention_layout not in ("headloop", "blanes"):
            raise ValueError(
                f"unknown attention_layout {self.attention_layout!r}")
        if self.bwd_residuals not in ("recompute", "probs"):
            raise ValueError(
                f"unknown bwd_residuals {self.bwd_residuals!r}")
        if self.embedding_backend not in ("bpemb", "bert", "hash"):
            raise ValueError(
                f"unknown embedding_backend {self.embedding_backend!r}")
        if self.tokenizer not in ("treebank", "regex"):
            raise ValueError(f"unknown tokenizer {self.tokenizer!r}")
        if self.serve_scorer not in ("auto", "gather", "dense"):
            raise ValueError(f"unknown serve_scorer {self.serve_scorer!r}")
        if self.serve_cache_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"unknown serve_cache_dtype {self.serve_cache_dtype!r}")
        if self.steps_per_call < 1:
            raise ValueError(f"steps_per_call must be >= 1, "
                             f"got {self.steps_per_call}")
        if self.eval_steps_per_call < 1:
            raise ValueError(f"eval_steps_per_call must be >= 1, "
                             f"got {self.eval_steps_per_call}")
        if self.prefetch_depth < 0:
            raise ValueError(f"prefetch_depth must be >= 0, "
                             f"got {self.prefetch_depth}")

    @property
    def dim_per_head(self) -> int:
        return self.news_dim // self.num_attention_heads

    @property
    def num_title_views(self) -> int:
        """NAML multi-view count: title + optional category/subcategory."""
        return 1 + int(self.use_category) + int(self.use_subcategory)

    @property
    def news_feature_width(self) -> int:
        """Width of one row of the combined news-feature matrix.

        word_ids:  num_words_title word ids (+cat +subcat columns).
        doc_table: 1 doc-pointer column (+cat +subcat columns) — matches the
        reference's news_combined (main.py:48, preprocess.py:50-72).
        """
        title_w = self.num_words_title if self.title_source == "word_ids" else 1
        return title_w + int(self.use_category) + int(self.use_subcategory)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def config_from_args(argv=None) -> Config:
    """Parse reference-compatible CLI flags into a Config (parameters.py:5-62)."""
    import argparse

    def str2bool(v):
        if isinstance(v, bool):
            return v
        if v.lower() in ("yes", "true", "t", "y", "1"):
            return True
        if v.lower() in ("no", "false", "f", "n", "0"):
            return False
        raise argparse.ArgumentTypeError("Boolean value expected.")

    p = argparse.ArgumentParser(prog="newsrecommendation_tpu")
    defaults = Config()
    for f in dataclasses.fields(Config):
        name = f.name
        default = getattr(defaults, name)
        if f.type == "bool" or isinstance(default, bool):
            p.add_argument(f"--{name}", type=str2bool, default=default)
        elif isinstance(default, int):
            p.add_argument(f"--{name}", type=int, default=default)
        elif isinstance(default, float):
            p.add_argument(f"--{name}", type=float, default=default)
        else:
            p.add_argument(f"--{name}", type=str, default=default)
    ns = p.parse_args(argv)
    return Config(**vars(ns))
