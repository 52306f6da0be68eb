"""Training-step equivalence oracle: torch autograd + torch.optim.Adam.

Extends the forward oracle (tests/test_reference_oracle.py) to the full
training step — the remaining offline-checkable slice of the acceptance
criterion. A clean-room torch transcription of the reference forward math
(the same functions as the numpy oracle, expressed in torch ops so
autograd provides the gradients) is fed the SAME weights and batches as
the production jitted train step, and we assert:

  1. per-leaf gradients equal (torch autograd vs jax.grad),
  2. parameters equal after TWO Adam updates on two different batches
     (torch.optim.Adam(lr) — the reference's optimizer, main.py:76 —
     vs our optax.adam with torch-default hyperparameters),
  3. the frozen-table path: nn.Embedding.from_pretrained(freeze=True)
     (NRMS.py:71-73) == our stop_gradient + set_to_zero mask (the table
     must be bitwise UNCHANGED after steps on both sides).

Any divergence here would compound over the ~47k steps of a real
MIND-small run and silently shift the published-AUC reproduction.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from newsrecommendation_tpu.models import get_model  # noqa: E402
from newsrecommendation_tpu.train import create_train_state  # noqa: E402
from newsrecommendation_tpu.train.step import make_train_step  # noqa: E402

from tests.test_reference_oracle import (  # noqa: E402
    NUM_NEWS,
    make_oracle_batch,
    make_oracle_table,
)

GRAD_RTOL, GRAD_ATOL = 2e-4, 1e-6
STEP_RTOL, STEP_ATOL = 5e-4, 2e-6


# ---------------------------------------------------------------------------
# The torch oracle: same clean-room transcription as the numpy oracle
# (tests/test_reference_oracle.py), in torch ops so autograd differentiates.
# ---------------------------------------------------------------------------


def t_linear(p, x):
    return x @ p["w"] + p["b"]


def t_attention_pooling(p, x, mask=None):
    """model_utils.py:21-31."""
    e = torch.tanh(t_linear(p["fc1"], x))
    alpha = torch.exp(t_linear(p["fc2"], e))
    if mask is not None:
        alpha = alpha * mask.unsqueeze(-1)
    alpha = alpha / (alpha.sum(dim=1, keepdim=True) + 1e-8)
    return (x * alpha).sum(dim=1)


def t_sdp(q, k, v, attn_mask=None):
    """model_utils.py:47-53."""
    d_k = q.shape[-1]
    scores = torch.exp(q @ k.transpose(-1, -2) / math.sqrt(d_k))
    if attn_mask is not None:
        scores = scores * attn_mask.unsqueeze(-2)
    attn = scores / (scores.sum(dim=-1, keepdim=True) + 1e-8)
    return attn @ v


def t_mhsa(p, x, mask, n_heads):
    """model_utils.py:78-95."""
    b, s, _ = x.shape
    q = t_linear(p["wq"], x).reshape(b, s, n_heads, -1).transpose(1, 2)
    k = t_linear(p["wk"], x).reshape(b, s, n_heads, -1).transpose(1, 2)
    v = t_linear(p["wv"], x).reshape(b, s, n_heads, -1).transpose(1, 2)
    m = None if mask is None else mask.unsqueeze(1).expand(-1, n_heads, -1)
    ctx = t_sdp(q, k, v, m)
    return ctx.transpose(1, 2).reshape(b, s, -1)


def t_title_word_vecs(table, features, cfg):
    """Embedding lookup with padding_idx=0 semantics (row-0 grad stays
    zero): multiply by (id != 0), the framework's equivalent formulation
    (models/common.py) of nn.Embedding(padding_idx=0)."""
    if cfg.title_source == "word_ids":
        ids = features[..., : cfg.num_words_title].long()
        vecs = table[ids] * (ids != 0).unsqueeze(-1).float()
        return vecs
    ptr = features[..., 0].long()
    flat = table[ptr] * (ptr != 0).unsqueeze(-1).float()
    return flat.reshape(*ptr.shape, cfg.num_words_title,
                        cfg.word_embedding_dim)


def t_pad_doc(news_vecs, log_mask, pad_doc):
    m = log_mask.unsqueeze(-1)
    return news_vecs * m + pad_doc.reshape(1, 1, -1) * (1.0 - m)


def t_nrms_news_encoder(params, cfg, features):
    p = params["news_encoder"]
    word_vecs = t_title_word_vecs(params["embedding_table"], features, cfg)
    ctx = t_mhsa(p["mhsa"], word_vecs, None, cfg.num_attention_heads)
    return t_attention_pooling(p["attn"], ctx, None)


def t_nrms_user_encoder(params, cfg, news_vecs, log_mask):
    p = params["user_encoder"]
    if cfg.user_log_mask:
        ctx = t_mhsa(p["mhsa"], news_vecs, log_mask,
                     cfg.num_attention_heads)
        return t_attention_pooling(p["attn"], ctx, log_mask)
    padded = t_pad_doc(news_vecs, log_mask, p["pad_doc"])
    ctx = t_mhsa(p["mhsa"], padded, None, cfg.num_attention_heads)
    return t_attention_pooling(p["attn"], ctx, None)


def t_naml_news_encoder(params, cfg, features):
    p = params["news_encoder"]
    word_vecs = t_title_word_vecs(params["embedding_table"], features, cfg)
    # nn.Conv1d(k=3, padding=1) — weight stored WIO, torch wants (O, I, W)
    ctx = torch.nn.functional.conv1d(
        word_vecs.transpose(1, 2), p["cnn"]["w"].permute(2, 1, 0),
        p["cnn"]["b"], padding=1).transpose(1, 2)
    title_vecs = t_attention_pooling(p["attn"], ctx, None)
    views = [title_vecs]
    col = cfg.num_words_title if cfg.title_source == "word_ids" else 1
    if cfg.use_category:
        ids = features[..., col].long()
        emb = p["category_emb"][ids] * (ids != 0).unsqueeze(-1).float()
        views.append(t_linear(p["category_dense"], emb))
        col += 1
    if cfg.use_subcategory:
        ids = features[..., col].long()
        emb = p["subcategory_emb"][ids] * (ids != 0).unsqueeze(-1).float()
        views.append(t_linear(p["subcategory_dense"], emb))
    if len(views) == 1:
        return views[0]
    return t_attention_pooling(p["final_attn"], torch.stack(views, dim=1),
                               None)


def t_naml_user_encoder(params, cfg, news_vecs, log_mask):
    p = params["user_encoder"]
    if cfg.user_log_mask:
        return t_attention_pooling(p["attn"], news_vecs, log_mask)
    padded = t_pad_doc(news_vecs, log_mask, p["pad_doc"])
    return t_attention_pooling(p["attn"], padded, None)


T_ORACLES = {
    "NRMS": (t_nrms_news_encoder, t_nrms_user_encoder),
    "NAML": (t_naml_news_encoder, t_naml_user_encoder),
}


def t_forward(params, cfg, batch):
    """Model.forward -> mean CE loss (NRMS.py:80-95 / NAML.py:113-129)."""
    news_enc, user_enc = T_ORACLES[cfg.model]
    b = batch["candidate"].shape[0]
    f = batch["candidate"].shape[-1]
    cand = news_enc(params, cfg, batch["candidate"].reshape(-1, f)).reshape(
        b, 1 + cfg.npratio, cfg.news_dim)
    hist = news_enc(params, cfg, batch["history"].reshape(-1, f)).reshape(
        b, cfg.user_log_length, cfg.news_dim)
    user = user_enc(params, cfg, hist, batch["history_mask"])
    scores = torch.einsum("bkd,bd->bk", cand, user)
    return torch.nn.functional.cross_entropy(scores, batch["label"].long())


# ---------------------------------------------------------------------------
# plumbing: jax param pytree <-> torch leaf dict
# ---------------------------------------------------------------------------


def to_torch_params(params, frozen_table: bool):
    """Dict-structured torch tensors; trainable leaves require grad.
    frozen_table mirrors nn.Embedding.from_pretrained(freeze=True)."""
    leaves = []

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        t = torch.tensor(np.asarray(tree, np.float32))
        trainable = not (frozen_table and path[0] == "embedding_table")
        # category/subcategory embedding tables ARE trainable params in the
        # reference (nn.Embedding, NAML.py:20-23)
        if trainable:
            t.requires_grad_(True)
            leaves.append((path, t))
        return t

    return walk(params), leaves


def torch_batch(batch):
    return {
        "history": torch.tensor(np.asarray(batch["history"])),
        "history_mask": torch.tensor(np.asarray(batch["history_mask"])),
        "candidate": torch.tensor(np.asarray(batch["candidate"])),
        "label": torch.tensor(np.asarray(batch["label"])),
    }


def assert_tree_close(jtree, ttree, rtol, atol, path=""):
    if isinstance(jtree, dict):
        for k in jtree:
            assert_tree_close(jtree[k], ttree[k], rtol, atol, f"{path}/{k}")
        return
    np.testing.assert_allclose(
        np.asarray(jtree), ttree.detach().numpy(), rtol=rtol, atol=atol,
        err_msg=path)


CASES = [
    # (model, title_source, freeze, user_log_mask, use_cat/subcat)
    ("NRMS", "word_ids", False, False, False),   # upstream NRMS train config
    ("NRMS", "word_ids", True, True, False),     # frozen table + masked user
    ("NAML", "doc_table", True, False, True),    # the fork's demo.sh config
]


@pytest.mark.parametrize("model_name,title_source,freeze,ulm,cats", CASES)
def test_gradients_match_torch_autograd(tiny_cfg, rng, model_name,
                                        title_source, freeze, ulm, cats):
    cfg = tiny_cfg.replace(
        model=model_name, title_source=title_source, deterministic=True,
        freeze_embedding=freeze, user_log_mask=ulm,
        use_category=cats, use_subcategory=cats, lr=3e-4)
    model = get_model(model_name)
    table = make_oracle_table(rng, cfg, NUM_NEWS)
    params = model.init(jax.random.PRNGKey(11), cfg, table, 3, 5)
    batch = make_oracle_batch(rng, cfg, NUM_NEWS)

    jloss, jgrads = jax.value_and_grad(
        lambda p: model.forward(
            p, cfg, {k: jnp.asarray(v) for k, v in batch.items()},
            deterministic=True)[0])(params)

    tparams, leaves = to_torch_params(params, freeze)
    tloss = t_forward(tparams, cfg, torch_batch(batch))
    tloss.backward()

    np.testing.assert_allclose(float(jloss), tloss.item(), rtol=1e-5)
    for path, t in leaves:
        jg = jgrads
        for k in path:
            jg = jg[k]
        # a parameter unused on this config's path (e.g. pad_doc when
        # user_log_mask=True) has grad None in torch and zeros in jax
        tg = (t.grad.numpy() if t.grad is not None
              else np.zeros(t.shape, np.float32))
        np.testing.assert_allclose(
            np.asarray(jg), tg, rtol=GRAD_RTOL, atol=GRAD_ATOL,
            err_msg="/".join(path))
    if freeze:
        # our frozen-table gradient is stop_gradient'd to exact zeros
        np.testing.assert_array_equal(
            np.asarray(jgrads["embedding_table"]), 0.0)


def test_optax_adam_matches_torch_adam(rng):
    """Optimizer parity in isolation: identical gradient sequences through
    optax.adam (our make_optimizer hyperparameters) and torch.optim.Adam
    (the reference's optimizer, main.py:76) produce identical parameter
    trajectories over 10 steps — tight tolerance, no model noise."""
    import optax

    lr = 3e-4
    p0 = rng.normal(size=(13, 7)).astype(np.float32)
    grads = [rng.normal(size=p0.shape).astype(np.float32) * 10 ** rng.uniform(
        -4, 1) for _ in range(10)]

    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    jp = jnp.asarray(p0)
    opt_state = tx.init(jp)
    tp = torch.tensor(p0, requires_grad=True)
    topt = torch.optim.Adam([tp], lr=lr)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, jp)
        jp = optax.apply_updates(jp, updates)
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()
        np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("model_name,title_source,freeze,ulm,cats", CASES)
def test_two_adam_steps_match_torch(tiny_cfg, rng, model_name, title_source,
                                    freeze, ulm, cats):
    """Two full train steps end-to-end vs the torch oracle.

    Composition check on top of the exact-gradient and exact-optimizer
    tests above. Elementwise equality is NOT expected here: Adam's
    first-step update is ~lr*sign(g), so float32 gradient noise on
    near-zero elements flips individual updates by up to 2*lr on either
    side — both trajectories are correct within f32. Assert instead that
    the update difference is bounded by the update scale (inf-norm < lr,
    mean far below it) and that the frozen table is bitwise untouched."""
    cfg = tiny_cfg.replace(
        model=model_name, title_source=title_source, deterministic=True,
        freeze_embedding=freeze, user_log_mask=ulm,
        use_category=cats, use_subcategory=cats, lr=3e-4,
        donate_state=False)
    model = get_model(model_name)
    table = make_oracle_table(rng, cfg, NUM_NEWS)
    params = model.init(jax.random.PRNGKey(13), cfg, table, 3, 5)
    batches = [make_oracle_batch(rng, cfg, NUM_NEWS) for _ in range(2)]

    # ours: the production jitted step (weight=1 rows == the reference's
    # plain mean CE)
    state = create_train_state(cfg, params)
    step = make_train_step(cfg, model, donate=False)
    for b in batches:
        dev = {k: jnp.asarray(v) for k, v in b.items()}
        dev["weight"] = jnp.ones((cfg.batch_size,), jnp.float32)
        state, metrics = step(state, dev, jax.random.PRNGKey(0))

    # torch: oracle forward + autograd + torch Adam (reference main.py:76)
    tparams, leaves = to_torch_params(params, freeze)
    opt = torch.optim.Adam([t for _, t in leaves], lr=cfg.lr)
    for b in batches:
        opt.zero_grad()
        loss = t_forward(tparams, cfg, torch_batch(b))
        loss.backward()
        opt.step()

    diffs = []

    def collect(jtree, ttree, path=""):
        if isinstance(jtree, dict):
            for k in jtree:
                collect(jtree[k], ttree[k], f"{path}/{k}")
            return
        diff = np.abs(np.asarray(jtree) - ttree.detach().numpy())
        # Adam's per-step update can reach ~1.7*lr (m_hat/sqrt(v_hat) > 1
        # when a tiny grad precedes a large one), so two steps with a
        # noise-driven sign flip bound the elementwise divergence at
        # ~2 * 1.7 * lr. Elements with structurally-zero gradients (e.g.
        # attn fc2 bias: a constant score shift cancels in the
        # normalization up to the 1e-8 eps) are pure noise and hit it.
        assert diff.max() < 4 * cfg.lr, (path, float(diff.max()))
        diffs.append(diff.ravel())

    collect(state.params, tparams)
    all_diff = np.concatenate(diffs)
    # across the whole model, sign-flip noise touches only scattered
    # near-zero-gradient elements — the aggregate drift stays tiny
    assert all_diff.mean() < 0.05 * cfg.lr, float(all_diff.mean())
    if freeze:
        # the frozen table must be bitwise untouched on BOTH sides
        np.testing.assert_array_equal(
            np.asarray(state.params["embedding_table"]),
            np.asarray(params["embedding_table"]))
