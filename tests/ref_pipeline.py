"""Independent NumPy reference pipeline for the full compressed prefill.

Dynamic shapes, fp32, straight-line control flow mirroring the reference's
patched forwards (/root/reference/framefusion/models/qwen2/modeling_qwen2.py +
framefusion/main.py): layer-0 pre-attention merge, per-layer post-attention
merge events, importance capture in the first layer after merging finishes,
prune, then the remaining layers dense. Decisions come from tests/oracle.py.

Used by tests/test_engine.py to validate the bucketed segmented executor:
same event sequence, same final token count, matching logits and greedy
decode.
"""

from __future__ import annotations

import numpy as np

import oracle


def _rms(x, w, eps):
    var = np.mean(x * x, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


def _rope_tables(pos, head_dim, theta):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    freqs = pos.astype(np.float32)[:, None] * inv[None, :]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb), np.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return np.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


class RefModel:
    """NumPy mirror of the functional Qwen2 stack over the same param pytree."""

    def __init__(self, params, cfg):
        self.p = {
            "embed": np.asarray(params["embed"], np.float32),
            "final_norm": np.asarray(params["final_norm"], np.float32),
            "layers": {k: np.asarray(v, np.float32) for k, v in params["layers"].items()},
        }
        if "lm_head" in params:
            self.p["lm_head"] = np.asarray(params["lm_head"], np.float32)
        self.cfg = cfg

    def layer_attn(self, l, h, pos, capture_num=0):
        cfg = self.cfg
        lp = {k: v[l] for k, v in self.p["layers"].items()}
        hd = cfg.head_dim_
        s = h.shape[0]
        x = _rms(h, lp["ln1"], cfg.rms_norm_eps)
        q = x @ lp["wq"] + (lp.get("bq", 0.0))
        k = x @ lp["wk"] + (lp.get("bk", 0.0))
        v = x @ lp["wv"] + (lp.get("bv", 0.0))
        q = q.reshape(s, cfg.num_heads, hd)
        k = k.reshape(s, cfg.num_kv_heads, hd)
        v = v.reshape(s, cfg.num_kv_heads, hd)
        cos, sin = _rope_tables(pos, hd, cfg.rope_theta)
        q = q * cos[:, None] + _rotate_half(q) * sin[:, None]
        k = k * cos[:, None] + _rotate_half(k) * sin[:, None]

        g = cfg.num_heads // cfg.num_kv_heads
        k_full = np.repeat(k, g, axis=1)  # (S, Hq, hd)
        v_full = np.repeat(v, g, axis=1)
        scores = np.einsum("shd,thd->hst", q, k_full) / np.sqrt(hd)
        causal = np.tril(np.ones((s, s), bool))
        scores = np.where(causal[None], scores, -1e30)
        probs = _softmax(scores, axis=-1)
        attn = np.einsum("hst,thd->shd", probs, v_full)
        h_out = h + attn.reshape(s, -1) @ lp["wo"]
        importance = None
        if capture_num:
            importance = probs[:, -capture_num:, :].mean(axis=(0, 1))
            self.last_capture_probs = probs[:, -capture_num:, :]  # (H, num, S)
        return h_out, k, v, importance

    def layer_mlp(self, l, h):
        cfg = self.cfg
        lp = {k: v[l] for k, v in self.p["layers"].items()}
        x = _rms(h, lp["ln2"], cfg.rms_norm_eps)
        silu = lambda t: t / (1.0 + np.exp(-t))
        return h + (silu(x @ lp["w_gate"]) * (x @ lp["w_up"])) @ lp["w_down"]

    def logits(self, h):
        x = _rms(h, self.p["final_norm"], self.cfg.rms_norm_eps)
        head = self.p["embed"].T if self.cfg.tie_word_embeddings else self.p["lm_head"]
        return x @ head


def ref_compressed_prefill(params, cfg, ff, embeds, patch_type, pos, patch_num, img_start, img_len):
    """Returns dict(logits, events, sparsity, caches, final arrays)."""
    model = RefModel(params, cfg)
    h = np.asarray(embeds, np.float32)
    pt = np.asarray(patch_type).copy()
    pos = np.asarray(pos).copy()
    orig_len = h.shape[0]
    sparsity: list[float] = []
    finish_m = finish_p = False
    events = []
    caches = {}

    def merge_now(h, pt, pos, layer_idx):
        nonlocal finish_m, finish_p
        frame_tok = int((pt != oracle.TEXT_TOKEN).sum())
        budget = oracle.compute_pruning_ratio(sparsity, ff.cost, ff.schedule_num_layers)
        res = oracle.merge_event(h, pt, ff.similarity_lower_bound, budget, frame_tok)
        if not res["capped"]:
            sparsity.append(res["above_ratio"])
            if res["above_ratio"] < ff.ratio_lower_bound:
                finish_m = True
            kind = "merge"
        else:
            finish_m = finish_p = True
            kind = "merge_capped"
        keep = res["keep"]
        events.append((layer_idx, kind, int((~keep).sum())))
        return res["merged"][keep], pt[keep], pos[keep]

    # layer-0 pre-attention merge
    h, pt, pos = merge_now(h, pt, pos, -1)

    layer = 0
    while layer < cfg.num_layers and not (finish_m and finish_p):
        capture = ff.num_importance_queries if (finish_m and not finish_p) else 0
        h_mid, k, v, importance = model.layer_attn(layer, h, pos, capture_num=capture)
        caches[layer] = (k, v)
        if not finish_m:
            h, pt, pos = merge_now(h_mid, pt, pos, layer)
            h = model.layer_mlp(layer, h)
        else:
            ratio = oracle.compute_pruning_ratio(sparsity, ff.cost, ff.schedule_num_layers)
            cur_img_len = img_len - (orig_len - h_mid.shape[0])
            # fp32 product before banker's rounding — lockstep with both
            # engine executors (host np.float32 / device jnp.round(fp32)).
            k_keep = int(round(float(np.float32(cur_img_len) * (np.float32(1.0) - np.float32(ratio)))))
            kept = oracle.prune_keep_indices(importance, img_start, cur_img_len, k_keep)
            events.append((layer, "prune", h_mid.shape[0] - len(kept)))
            h, pt, pos = h_mid[kept], pt[kept], pos[kept]
            h = model.layer_mlp(layer, h)
            finish_p = True
        layer += 1

    for l in range(layer, cfg.num_layers):
        h, k, v, _ = model.layer_attn(l, h, pos)
        caches[l] = (k, v)
        h = model.layer_mlp(l, h)

    logits = model.logits(h[-1:])[0]
    return dict(
        logits=logits, events=events, sparsity=sparsity, caches=caches,
        final_len=h.shape[0], pos=pos, patch_type=pt, model=model,
        tail_start=layer,
    )


def ref_greedy_decode(res, params, cfg, n_new):
    """NumPy greedy decode with per-layer ragged caches."""
    model = res["model"]
    caches = {l: [np.array(k), np.array(v)] for l, (k, v) in res["caches"].items()}
    pos_base = caches[0][0].shape[0]
    out = [int(res["logits"].argmax())]
    tok = out[0]
    hd = cfg.head_dim_
    g = cfg.num_heads // cfg.num_kv_heads
    for step in range(n_new - 1):
        h = model.p["embed"][tok][None, :].copy()
        cos, sin = _rope_tables(np.array([pos_base + step]), hd, cfg.rope_theta)
        for l in range(cfg.num_layers):
            lp = {k: v[l] for k, v in model.p["layers"].items()}
            x = _rms(h, lp["ln1"], cfg.rms_norm_eps)
            q = (x @ lp["wq"] + lp.get("bq", 0.0)).reshape(1, cfg.num_heads, hd)
            k = (x @ lp["wk"] + lp.get("bk", 0.0)).reshape(1, cfg.num_kv_heads, hd)
            v = (x @ lp["wv"] + lp.get("bv", 0.0)).reshape(1, cfg.num_kv_heads, hd)
            q = q * cos[:, None] + _rotate_half(q) * sin[:, None]
            k = k * cos[:, None] + _rotate_half(k) * sin[:, None]
            caches[l][0] = np.concatenate([caches[l][0], k], axis=0)
            caches[l][1] = np.concatenate([caches[l][1], v], axis=0)
            kf = np.repeat(caches[l][0], g, axis=1)
            vf = np.repeat(caches[l][1], g, axis=1)
            scores = np.einsum("shd,thd->hst", q, kf) / np.sqrt(hd)
            probs = _softmax(scores, axis=-1)
            attn = np.einsum("hst,thd->shd", probs, vf)
            h = h + attn.reshape(1, -1) @ lp["wo"]
            h = model.layer_mlp(l, h)
        logits = model.logits(h)[0]
        tok = int(logits.argmax())
        out.append(tok)
    return out
