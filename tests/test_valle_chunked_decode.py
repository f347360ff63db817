"""Chunked decode-cache exactness: ar_generate's chunked KV-cache layout
(batch >= 8 unrolls an outer loop over ~4 chunks; finished chunks leave the
scan carry and become invariants — models/valle.py ar_generate/decode_one)
is a pure LAYOUT optimization. Any n_chunks must sample bit-identical tokens:
same rng stream, same per-row positions, same attention support (completed
chunks are fully written, so "every slot valid" equals the single-chunk
``arange <= step`` mask restricted to that region).

Reference behavior being preserved: valle_ar.py:77-101's sequential sampling
semantics (stop-token latching included)."""
import jax
import jax.numpy as jnp
import numpy as np

from jatts_tpu.models.valle import VALLEAR, ar_generate

TINY = dict(idim=0, n_tokens=32, d_model=32, n_heads=2, n_layers=2,
            p_dropout=0.0)


def _setup(b=8, tx=7, tp=5):
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(0, 32, (b, tx)).astype(np.int32))
    # uneven per-row lengths so prefix regions differ across rows
    text_lens = jnp.asarray((rng.integers(3, tx + 1, b)).astype(np.int32))
    proms = jnp.asarray(rng.integers(0, 32, (b, tp, 8)).astype(np.int32))
    prom_lens = jnp.asarray((rng.integers(2, tp + 1, b)).astype(np.int32))
    model = VALLEAR(**TINY)
    variables = model.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        text, text_lens, proms, prom_lens,
        jnp.zeros((b, 4), jnp.int32), jnp.full((b,), 4, jnp.int32),
        deterministic=True,
    )
    return model, variables, (text, text_lens, proms, prom_lens)


def test_chunked_equals_single_chunk():
    # max_steps=11 -> t_total=10 -> chunk sizes [3, 3, 2, 2]: exercises
    # uneven chunks AND >1 completed-chunk score block in decode_step
    model, variables, inp = _setup(b=8)
    outs = {}
    for n_chunks in (1, 4):
        outs[n_chunks] = ar_generate(
            model, variables, jax.random.key(5), *inp,
            max_steps=11, n_chunks=n_chunks,
        )
    np.testing.assert_array_equal(
        np.asarray(outs[1]["codes"]), np.asarray(outs[4]["codes"])
    )
    np.testing.assert_array_equal(
        np.asarray(outs[1]["resp_lens"]), np.asarray(outs[4]["resp_lens"])
    )


def test_default_heuristic_matches_explicit():
    # b=8 default takes the 4-chunk path; pin that it equals n_chunks=4
    # (guards the heuristic wiring, not just the override)
    model, variables, inp = _setup(b=8)
    a = ar_generate(model, variables, jax.random.key(7), *inp, max_steps=9)
    e = ar_generate(model, variables, jax.random.key(7), *inp, max_steps=9,
                    n_chunks=4)
    np.testing.assert_array_equal(np.asarray(a["codes"]),
                                  np.asarray(e["codes"]))


def test_chunked_jittable():
    # the unrolled chunk loop + per-chunk scans must trace into ONE program
    model, variables, inp = _setup(b=8)
    f = jax.jit(lambda v, r: ar_generate(model, v, r, *inp, max_steps=11))
    out = f(variables, jax.random.key(5))
    ref = ar_generate(model, variables, jax.random.key(5), *inp, max_steps=11)
    np.testing.assert_array_equal(np.asarray(out["codes"]),
                                  np.asarray(ref["codes"]))
