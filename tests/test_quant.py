"""W8A8 FF quantization tests (ops/quant.py + ops/pallas_ff_int8.py).

Interpret-mode kernel parity on CPU; the compiled kernel runs on TPU via
bench.py's kernel-parity section. Serving-only: AD must raise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ct_clip_ut_tpu.ops import layers as L
from ct_clip_ut_tpu.ops.pallas_ff_int8 import (
    geglu_ff_int8, quantize_weight_int8, xla_int8_reference)
from ct_clip_ut_tpu.ops.quant import (
    is_quantized_ff, quantize_ctclip_ff, quantize_ff_params)

KEY = jax.random.PRNGKey(0)


def _ff_args(dim=64, inner=128, n=50, seed=1, dtype=jnp.float32):
    p = L.init_feedforward(KEY, dim, inner)
    # non-trivial LN params so the in-kernel LN is exercised
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    p["norm"]["gamma"] = jax.random.normal(k1, (dim,)) * 0.2 + 1.0
    p["norm"]["beta"] = jax.random.normal(k2, (dim,)) * 0.1
    x = jax.random.normal(k3, (2, n, dim), dtype)
    return p, x


def _unpack(q):
    return (q["norm"]["gamma"], q["norm"]["beta"], q["wv_q"], q["wg_q"],
            q["w2_q"], q["sv"], q["sg"], q["s2"])


def test_quantize_weight_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 96)) * 0.3
    wq, s = quantize_weight_int8(w)
    assert wq.dtype == jnp.int8 and s.shape == (96,)
    deq = wq.astype(jnp.float32) * s
    # symmetric 8-bit: max error is half an LSB of the per-column scale
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-7).all()


@pytest.mark.parametrize("residual", [False, True])
def test_int8_kernel_interpret_matches_xla_reference(residual):
    p, x = _ff_args(n=50)  # n=50 also exercises the pad-to-tile path
    q = quantize_ff_params(p)
    flat = x.reshape(-1, x.shape[-1])
    want = xla_int8_reference(flat, *_unpack(q), residual=residual)
    got = geglu_ff_int8(flat, *_unpack(q), True, residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_int8_ff_close_to_fp_ff():
    p, x = _ff_args(dim=128, inner=256, n=100)
    want = L.feedforward(p, x, use_pallas=False)
    q = quantize_ff_params(p)
    got = L.feedforward(q, x)  # routes via leaf-name detection
    # W8A8 dynamic per-token/per-column: ~0.5-1 % relative block error
    rel = (np.linalg.norm(np.asarray(got - want))
           / np.linalg.norm(np.asarray(want)))
    assert rel < 0.02, rel


def test_int8_ff_forward_only_ad_raises():
    p, x = _ff_args()
    q = quantize_ff_params(p)
    flat = x.reshape(-1, x.shape[-1])
    with pytest.raises(NotImplementedError, match="serving-only"):
        jax.grad(lambda v: geglu_ff_int8(
            v, *_unpack(q), True, False).sum())(flat)


def test_quantize_ctclip_ff_end_to_end_latents():
    from ct_clip_ut_tpu.models import ctclip as ctclip_mod
    from tests.test_models import SMALL_CLIP

    params = ctclip_mod.init_ctclip(KEY, SMALL_CLIP)
    qparams = quantize_ctclip_ff(params)

    # only the visual FFs changed; text tower object identity preserved
    assert qparams["text_transformer"] is params["text_transformer"]
    for stack in ("spatial", "temporal"):
        for layer in qparams["visual_transformer"][stack]["layers"]:
            assert is_quantized_ff(layer["ff"])
        for layer in params["visual_transformer"][stack]["layers"]:
            assert not is_quantized_ff(layer["ff"])  # original untouched

    img = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 20, 32, 32))
    want, _ = ctclip_mod.encode_image_latents(params, SMALL_CLIP, img)
    got, _ = ctclip_mod.encode_image_latents(qparams, SMALL_CLIP, img)
    # latents are l2-normed already; cosine similarity per volume. The bound
    # is loose because the discrete VQ argmin sits between the FFs and the
    # latent: at RANDOM init the tokens hug codebook decision boundaries, so
    # the ~0.5 % FF perturbation flips some assignments (trained codebooks
    # separate much better — serving-quality numbers live in the bench).
    cos = (np.asarray(want) * np.asarray(got)).sum(-1)
    assert (cos > 0.9).all(), cos


def test_quantized_tree_param_specs_replicated():
    """TP sharding rules key on leaf/parent names (parallel/sharding.py):
    the quantized FF leaves (wv_q/... under parent 'ff') must fall through
    to replicated P() — a mesh-sharded eval of a quantized tree places the
    int8 weights whole on every device instead of mis-sharding them."""
    from jax.sharding import PartitionSpec as P

    from ct_clip_ut_tpu.models import ctclip as ctclip_mod
    from ct_clip_ut_tpu.parallel import sharding as sh
    from tests.test_models import SMALL_CLIP

    params = quantize_ctclip_ff(ctclip_mod.init_ctclip(KEY, SMALL_CLIP))
    specs = sh.param_specs(params)
    ff0 = specs["visual_transformer"]["spatial"]["layers"][0]["ff"]
    for leaf in ("wv_q", "wg_q", "w2_q", "sv", "sg", "s2"):
        assert ff0[leaf] == P(), (leaf, ff0[leaf])
    # the unquantized text tower keeps its TP specs
    assert any(s != P() for s in jax.tree_util.tree_leaves(
        specs["text_transformer"]))


def test_int8_spatial_stack_continuous_error():
    """Pre-VQ (continuous) error through a full transformer stack — the real
    quantization-quality measure, no discrete argmin amplification."""
    from ct_clip_ut_tpu.config import TransformerConfig
    from ct_clip_ut_tpu.ops import transformer as T
    from ct_clip_ut_tpu.ops.quant import quantize_transformer_ff

    cfg = TransformerConfig(dim=64, depth=3, dim_head=16, heads=4, peg=False)
    p = T.init_transformer(KEY, cfg)
    q = quantize_transformer_ff(p)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 24, 64))
    want = T.transformer(p, cfg, x)
    got = T.transformer(q, cfg, x)
    if isinstance(want, tuple):
        want, got = want[0], got[0]
    rel = (np.linalg.norm(np.asarray(got - want))
           / np.linalg.norm(np.asarray(want)))
    assert rel < 0.02, rel
