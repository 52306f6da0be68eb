"""Staged remote-compile probe for the bench train step.

The axon remote-compile of the full train step has been observed to wedge
(>45 min, zero progress) while the same Pallas kernels compile standalone
in ~5 min. This probe lowers and compiles the bench program in stages with
timing prints so a hang can be localized: forward-only loss first, then the
full grad+Adam step. Each stage lands in the persistent .jax_cache, so a
later bench.py run reuses everything that succeeded.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl", "rbg")

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train import create_train_state
    from newsrecommendation_tpu.train.step import make_train_step

    cfg = Config(
        model="NRMS", title_source="word_ids", num_words_title=20,
        user_log_length=50, word_embedding_dim=300, news_dim=400,
        news_query_vector_dim=200, user_query_vector_dim=200,
        num_attention_heads=20, batch_size=128, npratio=4, drop_rate=0.2,
        lr=3e-4, deterministic=False, freeze_embedding=True,
        compute_dtype="bfloat16",
    )
    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    vocab = 30000
    table = rng.normal(0, 0.06, size=(vocab, cfg.word_embedding_dim)).astype(
        np.float32)
    table[0] = 0.0
    params = model.init(jax.random.PRNGKey(0), cfg, table)
    state = create_train_state(cfg, params)

    f = cfg.news_feature_width
    b = cfg.batch_size
    r = np.random.default_rng(1)
    batch = {
        "history": jax.numpy.asarray(r.integers(
            0, vocab, size=(b, cfg.user_log_length, f)), jax.numpy.int32),
        "history_mask": jax.numpy.asarray(
            (r.random((b, cfg.user_log_length)) > 0.3).astype(np.float32)),
        "candidate": jax.numpy.asarray(r.integers(
            0, vocab, size=(b, 1 + cfg.npratio, f)), jax.numpy.int32),
        "label": jax.numpy.asarray(r.integers(
            0, cfg.npratio + 1, size=(b,)), jax.numpy.int32),
        "weight": jax.numpy.ones((b,), jax.numpy.float32),
    }
    base_rng = jax.random.PRNGKey(0)

    t0 = time.time()

    def stamp(msg):
        print(f"[{time.time() - t0:8.1f}s] {msg}", flush=True)

    stamp("stage 1: forward-only loss — lowering")
    fwd = jax.jit(lambda p, batch, key: model.forward(
        p, cfg, batch, rng=key, deterministic=False)[0])
    lowered = fwd.lower(state.params, batch, base_rng)
    stamp("stage 1: lowered; compiling (remote)")
    compiled = lowered.compile()
    stamp("stage 1: compiled; executing")
    out = compiled(state.params, batch, base_rng)
    stamp(f"stage 1: loss={float(out):.4f}")

    stamp("stage 2: full train step (grad+Adam) — lowering")
    # default donation == bench.py's executable, so this compile lands in
    # the persistent cache under the exact key bench.py will look up
    step = make_train_step(cfg, model)
    lowered = step.lower(state, batch, base_rng)
    stamp("stage 2: lowered; compiling (remote)")
    compiled = lowered.compile()
    stamp("stage 2: compiled; executing")
    state2, metrics = compiled(state, batch, base_rng)
    stamp(f"stage 2: loss={float(metrics['loss']):.4f} done")


if __name__ == "__main__":
    main()
