"""Worker process for the live two-process cluster test.

Launched twice by tests/test_multiprocess.py, each worker joins a real
2-process JAX CPU cluster (jax.distributed.initialize + Gloo collectives,
4 virtual devices per process => an 8-device global ('data','table') mesh)
and executes the REAL multi-controller code paths:

  - parallel.mesh.shard_batch -> jax.make_array_from_process_local_data
    (each process feeds only its addressable rows of the global batch);
  - parallel.spmd.make_spmd_train_step (shard_map psum gradient sync);
  - per-process eval shards + eval.pipeline.cross_process_sum
    (process_allgather) — the reference's dist.reduce(SUM) analogue
    (/root/reference/src/main.py:269-275).

Prints one line `RESULT {json}` with the 3-step loss trajectory and the
globally-reduced eval metrics; the parent asserts both workers agree with
each other and with a single-process 8-device run of the same batches.
"""

import json
import os
import sys


def main():
    coord, pid, tmpdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    # pin the PRNG impl: the parent pytest process may have rbg set
    # globally (cli.main does), and init weights must match bit-for-bit
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2

    import numpy as np

    from newsrecommendation_tpu.config import Config
    from newsrecommendation_tpu.data import (
        EvalSamples,
        TrainSamples,
        build_news_features,
        read_news,
    )
    from newsrecommendation_tpu.data.mind import random_word_embeddings
    from newsrecommendation_tpu.eval import (
        compute_news_scoring,
        evaluate_impressions,
    )
    from newsrecommendation_tpu.models import get_model
    from newsrecommendation_tpu.parallel import make_mesh
    from newsrecommendation_tpu.parallel.mesh import (
        local_batch_size,
        owned_data_rows,
        shard_batch,
    )
    from newsrecommendation_tpu.parallel.spmd import (
        make_spmd_train_step,
        place_state,
    )
    from newsrecommendation_tpu.train import create_train_state

    with open(os.path.join(tmpdir, "cfg.json"), "r", encoding="utf-8") as f:
        cfg = Config(**json.load(f))
    global_batch = cfg.batch_size

    corpus = read_news(os.path.join(tmpdir, "train", "news.tsv"), cfg, "train")
    feats = build_news_features(corpus, cfg)
    table = random_word_embeddings(corpus.word_dict, cfg.word_embedding_dim,
                                   cfg.seed)
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(cfg.seed), cfg, table,
                        len(corpus.category_dict),
                        len(corpus.subcategory_dict))
    state = create_train_state(cfg, params)

    mesh = make_mesh(cfg)
    assert mesh.devices.shape == (8, 1)
    # process p must own a contiguous run of data rows in process order, or
    # the parent's concat(shard0, shard1) reference batches won't line up
    rows = owned_data_rows(mesh)
    assert rows == list(range(4 * pid, 4 * pid + 4)), rows
    state = place_state(state, mesh, table_sharded=False)

    # --- 3 train steps on the global mesh, per-process shard feed ----------
    shard = os.path.join(tmpdir, "train",
                         f"behaviors_np{cfg.npratio}_{pid}.tsv")
    samples = TrainSamples.from_file(shard, corpus.news_index, cfg)
    feed = local_batch_size(mesh, global_batch)
    assert feed == global_batch // 2
    it = samples.iter_batches(feats, feed, epoch=0, seed=cfg.seed)
    train_step = make_spmd_train_step(cfg, model, mesh, state,
                                      batch_example=next(it))
    it = samples.iter_batches(feats, feed, epoch=0, seed=cfg.seed)
    base_rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        gbatch = shard_batch(mesh, next(it))
        state, m = train_step(state, gbatch, base_rng)
        losses.append(float(m["loss"]))

    # --- table-sharded mesh: the row-sharded lookup psum crosses the REAL
    # process boundary (parallel/sharded_embedding.py gather_rows_sharded
    # over the 'table' axis of a (4,2) mesh spanning both processes) ------
    from newsrecommendation_tpu.parallel.sharded_embedding import shard_table

    cfg2 = cfg.replace(table_shards=2, data_parallel=4, batch_size=8)
    mesh2 = make_mesh(cfg2)
    assert mesh2.devices.shape == (4, 2)
    rows2 = owned_data_rows(mesh2)
    assert rows2 == list(range(2 * pid, 2 * pid + 2)), rows2
    table2 = shard_table(np.asarray(table, np.float32), 2)
    params2 = model.init(jax.random.PRNGKey(cfg.seed), cfg2, table2,
                         len(corpus.category_dict),
                         len(corpus.subcategory_dict))
    state2 = place_state(create_train_state(cfg2, params2), mesh2,
                         table_sharded=True)
    feed2 = local_batch_size(mesh2, cfg2.batch_size)
    assert feed2 == 4
    it2 = samples.iter_batches(feats, feed2, epoch=1, seed=cfg.seed)
    step2 = make_spmd_train_step(cfg2, model, mesh2, state2,
                                 batch_example=next(it2))
    it2 = samples.iter_batches(feats, feed2, epoch=1, seed=cfg.seed)
    sharded_losses = []
    for _ in range(2):
        gbatch = shard_batch(mesh2, next(it2))
        state2, m2 = step2(state2, gbatch, base_rng)
        sharded_losses.append(float(m2["loss"]))

    # --- multi-controller checkpoint round trip (VERDICT r3 task 3) --------
    # Save mid-run with the TRAINABLE table (and its Adam moments)
    # row-sharded ACROSS the process boundary: process 0 writes the main
    # file, both processes write their local table rows as shard files
    # (reference rank-0 save semantics, main.py:118-127). Then restore into
    # a fresh placed state and verify the trajectory continues identically.
    from jax.experimental import multihost_utils

    from newsrecommendation_tpu.ckpt import load_checkpoint, save_checkpoint

    model_dir = os.path.join(tmpdir, "model")
    save_checkpoint(model_dir, "epoch-1.ckpt", state2, cfg2,
                    category_dict=corpus.category_dict,
                    subcategory_dict=corpus.subcategory_dict)
    # test-only barrier: both processes' files must exist before the load
    # below (production loads happen on restart, long after the writes)
    multihost_utils.sync_global_devices("ckpt written")

    post_batches = [next(it2), next(it2)]
    post_save_losses = []
    for b in post_batches:
        state2, m2 = step2(state2, shard_batch(mesh2, b), base_rng)
        post_save_losses.append(float(m2["loss"]))

    # fresh state (different init seed so a failed restore can't pass),
    # placed with the same shardings, restored from disk
    params3 = model.init(jax.random.PRNGKey(cfg.seed + 99), cfg2, table2,
                         len(corpus.category_dict),
                         len(corpus.subcategory_dict))
    template = place_state(create_train_state(cfg2, params3), mesh2,
                           table_sharded=True)
    restored, sidecar = load_checkpoint(
        os.path.join(model_dir, "epoch-1.ckpt"), template, cfg2)
    assert sidecar["sharded_leaves"], "trainable sharded table must be " \
        "checkpointed via shard files"
    assert int(restored.step) == int(state2.step) - 2
    resumed_losses = []
    for b in post_batches:
        restored, m3 = step2(restored, shard_batch(mesh2, b), base_rng)
        resumed_losses.append(float(m3["loss"]))

    # --- distributed eval: per-process impression shard + allgather sum ----
    dev_corpus = read_news(os.path.join(tmpdir, "dev", "news.tsv"), cfg,
                           "test", category_dict=corpus.category_dict,
                           subcategory_dict=corpus.subcategory_dict,
                           word_dict=corpus.word_dict)
    dev_feats = build_news_features(dev_corpus, cfg)
    eval_params = jax.tree_util.tree_map(np.asarray, state.params)
    news_scoring = compute_news_scoring(model, eval_params, cfg, dev_feats)
    eval_samples = EvalSamples.from_file(
        os.path.join(tmpdir, "dev", f"behaviors_{pid}.tsv"),
        dev_corpus.news_index, cfg, max_candidates=cfg.max_candidates)
    results = evaluate_impressions(model, eval_params, cfg, eval_samples,
                                   news_scoring, mesh=mesh)

    print("RESULT " + json.dumps({
        "pid": pid,
        "losses": losses,
        "sharded_losses": sharded_losses,
        "post_save_losses": post_save_losses,
        "resumed_losses": resumed_losses,
        "eval": {k: float(v) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
