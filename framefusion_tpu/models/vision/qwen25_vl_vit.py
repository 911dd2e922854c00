"""Qwen2.5-VL vision transformer — window attention, RMSNorm, SwiGLU.

The stretch config (BASELINE.json configs[4], Qwen2.5-VL-72B) rides this
tower. Deltas from the Qwen2-VL ViT (models/vision/qwen2_vl_vit.py), per the
HF ``Qwen2_5_VisionTransformerPretrainedModel`` (the offline oracle,
tests/test_vision.py::TestQwen25VLViTVsHF):

  * tokens are PERMUTED into window order (merge-unit groups of
    spatial_merge_size^2 rearranged by ``get_window_index``); most blocks
    attend within ``window_size``-pixel windows (ragged at the grid edges),
    while ``fullatt_block_indexes`` attend within whole frames; the merger
    output is inverse-permuted back;
  * RMSNorm (no bias) for norm1/norm2/ln_q; SwiGLU MLP with biases
    (gate/up/down, silu);
  * patch embed / 2D rotary / PatchMerger otherwise as Qwen2-VL.

TPU formulation: two attention paths, identical decisions (same token sets
attend; parity pinned in tests/test_vision.py::TestQwen25VLViTVsHF):

  * ``attn_impl="masked"``: the window/frame raggedness becomes a SEGMENT-ID
    mask on one batched (N, N) attention einsum — segment ids are computed
    host-side per grid shape (static) and compared in-graph. Shape-agnostic
    oracle; O(N^2) score materialisation makes it tiny-grid-only.
  * ``attn_impl="windowed"`` (default): padded-window batched attention —
    tokens gather into a STATIC (n_windows, window_cap) layout (host-side
    per-grid indices; ragged edge windows key-masked), one batched einsum
    over 64-token windows, scatter-free un-gather. Full-attention blocks
    reshape per frame and ride the fused bidirectional Pallas kernel on TPU
    (ops/kernels/bidir_attention.py; batched einsum elsewhere). Compute and
    HBM are O(N * window_cap) for window blocks — production-grid viable.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...weights import to_numpy


@dataclasses.dataclass(frozen=True)
class Qwen25VLViTConfig:
    hidden_size: int = 1280  # ViT width (HF vision_config.hidden_size)
    depth: int = 32
    num_heads: int = 16
    intermediate_size: int = 3420
    patch_size: int = 14
    temporal_patch_size: int = 2
    in_channels: int = 3
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    out_hidden_size: int = 3584
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tokens_per_second: int = 4
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2


def tiny_qwen25vl_vit_config(**kw) -> Qwen25VLViTConfig:
    base = dict(hidden_size=64, depth=3, num_heads=4, intermediate_size=96,
                patch_size=7, window_size=28, fullatt_block_indexes=(1,),
                out_hidden_size=32)
    base.update(kw)
    return Qwen25VLViTConfig(**base)


def init_params(cfg: Qwen25VLViTConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 8))

    def norm(*shape, scale=0.02):
        return jax.random.normal(next(keys), shape, cfg.dtype) * jnp.asarray(scale, cfg.dtype)

    d, i, n_l, mu = cfg.hidden_size, cfg.intermediate_size, cfg.depth, cfg.merge_unit
    layers = {
        "ln1_w": jnp.ones((n_l, d), cfg.dtype),
        "ln2_w": jnp.ones((n_l, d), cfg.dtype),
        "w_qkv": norm(n_l, d, 3 * d), "b_qkv": jnp.zeros((n_l, 3 * d), cfg.dtype),
        "wo": norm(n_l, d, d), "bo": jnp.zeros((n_l, d), cfg.dtype),
        "w_gate": norm(n_l, d, i), "b_gate": jnp.zeros((n_l, i), cfg.dtype),
        "w_up": norm(n_l, d, i), "b_up": jnp.zeros((n_l, i), cfg.dtype),
        "w_down": norm(n_l, i, d), "b_down": jnp.zeros((n_l, d), cfg.dtype),
    }
    return {
        "patch_proj": norm(cfg.patch_dim, d),
        "layers": layers,
        "merger_ln_w": jnp.ones((d,), cfg.dtype),
        "merger_w0": norm(mu * d, mu * d),
        "merger_b0": jnp.zeros((mu * d,), cfg.dtype),
        "merger_w1": norm(mu * d, cfg.out_hidden_size),
        "merger_b1": jnp.zeros((cfg.out_hidden_size,), cfg.dtype),
    }


def params_from_hf(state_dict, cfg: Qwen25VLViTConfig, prefix: str = "visual.") -> dict:

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def stack(fmt, transpose=False):
        arrs = [to_numpy(sd[fmt.format(i)]) for i in range(cfg.depth)]
        arrs = [a.T if transpose else a for a in arrs]
        return jnp.asarray(np.stack(arrs), cfg.dtype)

    layers = {
        "ln1_w": stack("blocks.{}.norm1.weight"),
        "ln2_w": stack("blocks.{}.norm2.weight"),
        "w_qkv": stack("blocks.{}.attn.qkv.weight", True),
        "b_qkv": stack("blocks.{}.attn.qkv.bias"),
        "wo": stack("blocks.{}.attn.proj.weight", True),
        "bo": stack("blocks.{}.attn.proj.bias"),
        "w_gate": stack("blocks.{}.mlp.gate_proj.weight", True),
        "b_gate": stack("blocks.{}.mlp.gate_proj.bias"),
        "w_up": stack("blocks.{}.mlp.up_proj.weight", True),
        "b_up": stack("blocks.{}.mlp.up_proj.bias"),
        "w_down": stack("blocks.{}.mlp.down_proj.weight", True),
        "b_down": stack("blocks.{}.mlp.down_proj.bias"),
    }
    kernel = to_numpy(sd["patch_embed.proj.weight"]).reshape(cfg.hidden_size, cfg.patch_dim).T
    return {
        "patch_proj": jnp.asarray(kernel, cfg.dtype),
        "layers": layers,
        "merger_ln_w": jnp.asarray(to_numpy(sd["merger.ln_q.weight"]), cfg.dtype),
        "merger_w0": jnp.asarray(to_numpy(sd["merger.mlp.0.weight"]).T, cfg.dtype),
        "merger_b0": jnp.asarray(to_numpy(sd["merger.mlp.0.bias"]), cfg.dtype),
        "merger_w1": jnp.asarray(to_numpy(sd["merger.mlp.2.weight"]).T, cfg.dtype),
        "merger_b1": jnp.asarray(to_numpy(sd["merger.mlp.2.bias"]), cfg.dtype),
    }


def _rmsnorm(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def window_layout(grid_t: int, grid_h: int, grid_w: int, cfg: Qwen25VLViTConfig):
    """Host-side window bookkeeping for one grid (HF ``get_window_index``
    parity): returns (window_index (n_units,), token_perm (N,), inv_perm (N,),
    seg_window (N,), seg_full (N,)) as numpy arrays. ``seg_*`` are per-token
    segment ids IN THE PERMUTED ORDER; attention is masked to equal ids."""
    m = cfg.spatial_merge_size
    llm_h, llm_w = grid_h // m, grid_w // m
    win = cfg.window_size // m // cfg.patch_size  # merge units per window side
    mu = cfg.merge_unit

    index = np.arange(grid_t * llm_h * llm_w).reshape(grid_t, llm_h, llm_w)
    # HF pads by (win - llm % win) even when llm % win == 0 (a full extra
    # block of -100s that drops out); replicate exactly.
    pad_h = win - llm_h % win
    pad_w = win - llm_w % win
    nwh = (llm_h + pad_h) // win
    nww = (llm_w + pad_w) // win
    padded = np.full((grid_t, llm_h + pad_h, llm_w + pad_w), -100, np.int64)
    padded[:, :llm_h, :llm_w] = index
    padded = padded.reshape(grid_t, nwh, win, nww, win).transpose(0, 1, 3, 2, 4)
    padded = padded.reshape(grid_t, nwh * nww, win, win)
    seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)  # units per window
    flat = padded.reshape(-1)
    window_index = flat[flat != -100]

    cu_window = np.concatenate([[0], np.cumsum(seqlens) * mu])
    cu_window = cu_window[np.concatenate([[True], np.diff(cu_window) != 0])]

    n = grid_t * grid_h * grid_w
    token_perm = (window_index[:, None] * mu + np.arange(mu)[None, :]).reshape(-1)
    inv_perm = np.argsort(token_perm)

    seg_window = np.zeros(n, np.int32)
    for wi in range(len(cu_window) - 1):
        seg_window[cu_window[wi]: cu_window[wi + 1]] = wi
    # full-attention blocks segment by FRAME; window permutation stays within
    # each frame, so frames remain contiguous in the permuted order.
    hw = grid_h * grid_w
    seg_full = np.repeat(np.arange(grid_t, dtype=np.int32), hw)
    return window_index, token_perm, inv_perm, seg_window, seg_full


def padded_window_layout(grid_t: int, grid_h: int, grid_w: int,
                         cfg: Qwen25VLViTConfig):
    """Host-side indices for the padded-window attention layout.

    Windows are contiguous, variable-length spans of the PERMUTED token
    order (``window_layout``'s invariant). Padding each to the
    ``window_cap`` = (window_size/merge/patch)^2 * merge_unit token maximum
    (64 at production geometry) turns the ragged per-window attention into
    ONE static batched einsum; edge windows are key-masked.

    Returns (win_gather (nw, cap) indices into the permuted array with ``n``
    as the pad slot, win_valid (nw, cap) bool, back_idx (n,) mapping
    permuted position -> flat padded index). Gather/back-gather are
    inverse row gathers — no scatters (scatters serialize on TPU).
    """
    m = cfg.spatial_merge_size
    win = cfg.window_size // m // cfg.patch_size
    mu = cfg.merge_unit
    n = grid_t * grid_h * grid_w
    llm_h, llm_w = grid_h // m, grid_w // m
    pad_h, pad_w = win - llm_h % win, win - llm_w % win
    nwh, nww = (llm_h + pad_h) // win, (llm_w + pad_w) // win
    padded = np.zeros((grid_t, llm_h + pad_h, llm_w + pad_w), np.int64)
    padded[:, :llm_h, :llm_w] = 1
    padded = padded.reshape(grid_t, nwh, win, nww, win).transpose(0, 1, 3, 2, 4)
    tok_lens = padded.reshape(grid_t * nwh * nww, -1).sum(axis=1) * mu
    starts = np.concatenate([[0], np.cumsum(tok_lens)])[:-1]
    keep = tok_lens > 0  # HF's always-pad quirk yields fully-empty windows
    starts, tok_lens = starts[keep], tok_lens[keep]
    cap = win * win * mu
    slots = np.arange(cap, dtype=np.int64)
    win_valid = slots[None, :] < tok_lens[:, None]
    win_gather = np.where(win_valid, starts[:, None] + slots[None, :], n)
    # Valid slots enumerate permuted positions 0..n-1 in order (windows tile
    # the permuted sequence contiguously), so the inverse is a flat gather.
    back_idx = np.flatnonzero(win_valid.reshape(-1))
    assert back_idx.shape == (n,)
    return win_gather, win_valid, back_idx


def _vision_rope(grid_h, grid_w, cfg: Qwen25VLViTConfig):
    """(h*w, head_dim) cos/sin in merge-block order — identical construction
    to qwen2_vl_vit.vision_rope_cos_sin (HF shares ``rot_pos_emb``)."""
    from .qwen2_vl_vit import Qwen2VLViTConfig, vision_rope_cos_sin

    proxy = Qwen2VLViTConfig(
        embed_dim=cfg.hidden_size, num_heads=cfg.num_heads,
        patch_size=cfg.patch_size, spatial_merge_size=cfg.spatial_merge_size,
        rope_theta=cfg.rope_theta,
    )
    return vision_rope_cos_sin(grid_h, grid_w, proxy)


@functools.partial(jax.jit, static_argnames=("grid_t", "grid_h", "grid_w", "cfg", "attn_impl"))
def encode_video(params: dict, patches: jnp.ndarray, grid_t: int, grid_h: int,
                 grid_w: int, cfg: Qwen25VLViTConfig, attn_impl: str = "auto") -> jnp.ndarray:
    """(grid_t*grid_h*grid_w, C*tp*p*p) pixel patches (HF processor layout,
    same as Qwen2-VL) -> (N/merge_unit, out_hidden_size) embedding rows in
    the ORIGINAL (pre-window-permutation) merged order.

    ``attn_impl``: "auto" = "windowed" (full-attention blocks ride the fused
    Pallas kernel on TPU, batched einsum elsewhere); "windowed-interpret"
    runs that kernel interpreted (CPU tests); "masked" is the O(N^2)
    segment-mask oracle (module docstring).
    """
    n = grid_t * grid_h * grid_w
    assert patches.shape == (n, cfg.patch_dim), patches.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    scale = 1.0 / hd ** 0.5
    mu = cfg.merge_unit
    if attn_impl == "auto":
        attn_impl = "windowed"
    full_impl = "einsum"
    if attn_impl == "windowed" and jax.default_backend() == "tpu":
        full_impl = "pallas"
    elif attn_impl == "windowed-interpret":
        attn_impl, full_impl = "windowed", "interpret"

    window_index, token_perm, _, seg_window, seg_full = window_layout(grid_t, grid_h, grid_w, cfg)
    token_perm = jnp.asarray(token_perm)

    x = patches.astype(cfg.dtype) @ params["patch_proj"]  # (N, D)
    cos1, sin1 = _vision_rope(grid_h, grid_w, cfg)  # (hw, hd) one frame
    cos = jnp.tile(cos1, (grid_t, 1))[token_perm]
    sin = jnp.tile(sin1, (grid_t, 1))[token_perm]
    x = x[token_perm]

    hw = grid_h * grid_w
    if attn_impl == "masked":
        seg_w, seg_f = jnp.asarray(seg_window), jnp.asarray(seg_full)
        seg_masks = {
            False: seg_w[:, None] == seg_w[None, :],
            True: seg_f[:, None] == seg_f[None, :],
        }
    else:
        wg, wv, back = padded_window_layout(grid_t, grid_h, grid_w, cfg)
        win_gather = jnp.asarray(wg.reshape(-1))
        key_ok = jnp.asarray(wv)[:, None, None, :]  # (nw, 1, 1, cap)
        back_idx = jnp.asarray(back)
        nw, cap = wv.shape

    def attend(q, k, v, full_att: bool):
        """(N, nh, hd) q/k/v in permuted order -> (N, nh, hd) context."""
        if full_att and full_impl in ("pallas", "interpret"):
            from ...ops.kernels.bidir_attention import flash_bidir_attention

            out = flash_bidir_attention(
                q.reshape(grid_t, hw, nh, hd), k.reshape(grid_t, hw, nh, hd),
                v.reshape(grid_t, hw, nh, hd), scale=scale,
                interpret=full_impl == "interpret")
            return out.reshape(n, nh, hd)
        if attn_impl == "masked":
            scores = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32)
            scores = jnp.where(seg_masks[full_att][None], scores * jnp.float32(scale),
                               jnp.float32(-1e30))
            probs = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("hqk,khd->qhd", probs.astype(v.dtype), v,
                              preferred_element_type=jnp.float32).astype(q.dtype)
        if full_att:
            qf = q.reshape(grid_t, hw, nh, hd)
            kf = k.reshape(grid_t, hw, nh, hd)
            vf = v.reshape(grid_t, hw, nh, hd)
            scores = jnp.einsum("tqhd,tkhd->thqk", qf, kf,
                                preferred_element_type=jnp.float32) * jnp.float32(scale)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("thqk,tkhd->tqhd", probs.astype(v.dtype), vf,
                             preferred_element_type=jnp.float32)
            return out.reshape(n, nh, hd).astype(q.dtype)
        # Padded-window batch: row-gather into (nw, cap), attend, un-gather.
        pad = jnp.zeros((1, nh, hd), q.dtype)
        qw = jnp.take(jnp.concatenate([q, pad]), win_gather, axis=0).reshape(nw, cap, nh, hd)
        kw = jnp.take(jnp.concatenate([k, pad]), win_gather, axis=0).reshape(nw, cap, nh, hd)
        vw = jnp.take(jnp.concatenate([v, pad]), win_gather, axis=0).reshape(nw, cap, nh, hd)
        scores = jnp.einsum("wqhd,wkhd->whqk", qw, kw,
                            preferred_element_type=jnp.float32) * jnp.float32(scale)
        scores = jnp.where(key_ok, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("whqk,wkhd->wqhd", probs.astype(v.dtype), vw,
                         preferred_element_type=jnp.float32)
        return jnp.take(out.reshape(nw * cap, nh, hd), back_idx, axis=0).astype(q.dtype)

    def block(x, lp, full_att: bool):
        z = _rmsnorm(x, lp["ln1_w"], cfg.rms_norm_eps)
        qkv = (z @ lp["w_qkv"] + lp["b_qkv"]).reshape(n, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        c = cos[:, None, :]
        s = sin[:, None, :]
        q = (q.astype(jnp.float32) * c + _rotate_half(q.astype(jnp.float32)) * s).astype(x.dtype)
        k = (k.astype(jnp.float32) * c + _rotate_half(k.astype(jnp.float32)) * s).astype(x.dtype)
        out = attend(q, k, v, full_att).reshape(n, cfg.hidden_size).astype(x.dtype)
        x = x + (out @ lp["wo"] + lp["bo"])
        z = _rmsnorm(x, lp["ln2_w"], cfg.rms_norm_eps)
        gated = jax.nn.silu(z @ lp["w_gate"] + lp["b_gate"]) * (z @ lp["w_up"] + lp["b_up"])
        return x + (gated @ lp["w_down"] + lp["b_down"])

    # Static per-layer window/full choice: unrolled python loop over the
    # (few) blocks — fullatt_block_indexes is a config constant.
    for l in range(cfg.depth):
        lp = jax.tree.map(lambda a, l=l: a[l], params["layers"])
        x = block(x, lp, l in cfg.fullatt_block_indexes)

    z = _rmsnorm(x, params["merger_ln_w"], cfg.rms_norm_eps)
    z = z.reshape(n // mu, mu * cfg.hidden_size)
    z = jax.nn.gelu(z @ params["merger_w0"] + params["merger_b0"], approximate=False)
    z = z @ params["merger_w1"] + params["merger_b1"]
    # merger output rows are merge units in WINDOW order; inverse-permute
    # (HF: hidden_states[reverse_indices]) back to the original order.
    return z[jnp.asarray(np.argsort(window_index))]
