"""Capture a jax.profiler trace of the train step and print per-op times.

Runs a handful of train steps under jax.profiler.trace, then parses the
xplane proto with tensorboard_plugin_profile to print the top device ops by
self time — the "where do the milliseconds go" tool.

    python tools/profile_step.py [--dtype bfloat16] [--freeze] [--pallas off]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(cfg, trace_dir, steps=12):
    import jax

    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.train import create_train_state
    from newsrecommendation_tpu.train.step import make_train_step

    model = get_model(cfg.model)
    rng = np.random.default_rng(0)
    vocab = 30000
    table = rng.normal(0, 0.06, size=(vocab, cfg.word_embedding_dim)).astype(
        np.float32)
    table[0] = 0.0
    params = model.init(jax.random.PRNGKey(0), cfg, table)
    state = create_train_state(cfg, params)
    train_step = make_train_step(cfg, model)

    f = cfg.news_feature_width
    b = cfg.batch_size

    def make_batch(seed):
        r = np.random.default_rng(seed)
        return {
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

    batches = [make_batch(s) for s in range(8)]
    key = jax.random.PRNGKey(0)
    for i in range(3):  # compile + settle
        state, m = train_step(state, batches[i % 8], key)
    float(m["loss"])

    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            state, m = train_step(state, batches[i % 8], key)
        float(m["loss"])
    print(f"trace written to {trace_dir}", flush=True)


def summarize(trace_dir, top=40):
    """Parse the newest xplane.pb and print per-op device times.

    Parses the XSpace proto directly with the tsl protobuf — the
    tensorboard profile plugin's converter is incompatible with the
    baked-in TF (its _pywrap_profiler lacks xspace_to_tools_data and its
    _pb2 files predate protobuf 4). The TPU device plane's "XLA Ops" line
    carries one event per executed op; aggregating durations by op name
    and dividing by the "Steps" line's event count gives ms/step per op.
    """
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb")))
    assert paths, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    devs = [p for p in xs.planes if p.name.startswith("/device:")
            and any(l.name == "XLA Ops" and l.events for l in p.lines)]
    assert devs, (f"no device plane with an 'XLA Ops' line in {paths[-1]} "
                  f"(planes: {[p.name for p in xs.planes]})")
    if len(devs) > 1:
        print(f"# {len(devs)} device planes; summarizing {devs[0].name} "
              f"(others: {[p.name for p in devs[1:]]})")
    dev = devs[0]
    md = dev.event_metadata
    lines = {l.name: l for l in dev.lines}
    nsteps = max(len(lines["Steps"].events), 1) if "Steps" in lines else 1
    if "Steps" in lines:
        avg = (sum(e.duration_ps for e in lines["Steps"].events)
               / nsteps / 1e9)
        print(f"device={dev.name} steps={nsteps} avg_step={avg:.3f} ms")
    agg, cnt = collections.Counter(), collections.Counter()
    for e in lines["XLA Ops"].events:
        name = md[e.metadata_id].name
        agg[name] += e.duration_ps
        cnt[name] += 1
    total = sum(agg.values())
    print(f"total device op time: {total / nsteps / 1e9:.3f} ms/step")
    print(f"{'ms/step':>8}  {'count':>5}  op")
    for name, ps in agg.most_common(top):
        print(f"{ps / nsteps / 1e9:8.3f}  x{cnt[name] // nsteps:<4} "
              f"{name[:120]}")


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="NRMS")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--freeze", action="store_true")
    ap.add_argument("--pallas", default="auto")
    ap.add_argument("--trace_dir", default="/tmp/nr_trace")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if not args.parse_only:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_default_prng_impl", "rbg")
        from newsrecommendation_tpu.config import Config
        from newsrecommendation_tpu.ops.pallas import set_pallas_mode

        set_pallas_mode(args.pallas)
        naml = args.model == "NAML"
        cfg = Config(
            model=args.model, title_source="word_ids", num_words_title=20,
            user_log_length=50, word_embedding_dim=300, news_dim=400,
            news_query_vector_dim=200, user_query_vector_dim=200,
            num_attention_heads=20, batch_size=128, npratio=4, drop_rate=0.2,
            lr=3e-4, deterministic=False, compute_dtype=args.dtype,
            freeze_embedding=args.freeze,
            # match bench.py's NAML line (cat+subcat views on)
            use_category=naml, use_subcategory=naml,
        )
        capture(cfg, args.trace_dir)
    summarize(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
