"""Micro-timings of the decode step's constituent ops on the real chip.

Each part runs 192x inside one jit (fori_loop, scalar result) so we can see
which component carries the ~2 ms/step gap between the measured step time
and the HBM-traffic floor (PERF.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 192
B, H, DH, S_ENC, S_DEC, L = 64, 8, 64, 1500, 448, 6
D = H * DH
V = 51865


def timed(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    np.asarray(loop(*args))
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    return round((time.perf_counter() - t0) / ITERS * 1e3, 3)


rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H, DH).astype(np.float32)).astype(jnp.bfloat16)
kq = jnp.asarray(rng.randint(-127, 127, (L, B, S_ENC, H, DH)), jnp.int8)
vq = jnp.asarray(rng.randint(-127, 127, (L, B, S_ENC, H, DH)), jnp.int8)
ck = jnp.asarray(rng.randn(L, B, H, DH, S_DEC).astype(np.float32)).astype(jnp.bfloat16)
cv = jnp.asarray(rng.randn(L, B, H, DH, S_DEC).astype(np.float32)).astype(jnp.bfloat16)
w_head = jnp.asarray(rng.randn(D, V).astype(np.float32) * 0.02).astype(jnp.bfloat16)
x = jnp.asarray(rng.randn(B, D).astype(np.float32)).astype(jnp.bfloat16)
logits = jnp.asarray(rng.randn(B, V).astype(np.float32))
wd = jnp.asarray(rng.randn(L, 4, D, D).astype(np.float32) * 0.02).astype(jnp.bfloat16)
wm = jnp.asarray(rng.randn(L, D, 4 * D).astype(np.float32) * 0.02).astype(jnp.bfloat16)
wm2 = jnp.asarray(rng.randn(L, 4 * D, D).astype(np.float32) * 0.02).astype(jnp.bfloat16)


def cross_attn(i, q, kq, vq):
    qq = q + i * jnp.bfloat16(1e-9)
    out = jnp.float32(0.0)
    for l in range(L):
        lg = jnp.einsum("bhd,bshd->bhs", qq, kq[l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        p = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhs,bshd->bhd", p, vq[l].astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)
        out = out + jnp.sum(o).astype(jnp.float32)
    return out


def self_attn(i, q, ck, cv):
    qq = q + i * jnp.bfloat16(1e-9)
    out = jnp.float32(0.0)
    for l in range(L):
        lg = jnp.einsum("bhd,bhds->bhs", qq, ck[l],
                        preferred_element_type=jnp.float32)
        p = jax.nn.softmax(lg, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhs,bhds->bhd", p, cv[l],
                       preferred_element_type=jnp.bfloat16)
        out = out + jnp.sum(o).astype(jnp.float32)
    return out


def lm_head(i, x, w):
    lg = jnp.dot(x + i * jnp.bfloat16(1e-9), w,
                 preferred_element_type=jnp.float32)
    return jnp.sum(lg[:, 0])


def dense_stack(i, x, wd, wm, wm2):
    h = x + i * jnp.bfloat16(1e-9)
    out = jnp.float32(0.0)
    for l in range(L):
        for j in range(4):
            out = out + jnp.sum(
                jnp.dot(h, wd[l, j], preferred_element_type=jnp.bfloat16)
            ).astype(jnp.float32)
        m = jnp.dot(h, wm[l], preferred_element_type=jnp.bfloat16)
        out = out + jnp.sum(
            jnp.dot(m, wm2[l], preferred_element_type=jnp.bfloat16)
        ).astype(jnp.float32)
    return out


def logits_pass(i, lg):
    l2 = lg + i * 1e-9
    # ~ the rule stack + argmax + log_softmax of the sampled token
    l2 = jnp.where(l2 > 3.0, -1e30, l2)
    nxt = jnp.argmax(l2, axis=-1)
    lp = jax.nn.log_softmax(l2, axis=-1)
    return jnp.sum(nxt).astype(jnp.float32) + jnp.sum(lp[:, 0])


res = {
    "cross_attn_int8_ms": timed(cross_attn, q, kq, vq),
    "self_attn_ms": timed(self_attn, q, ck, cv),
    "lm_head_ms": timed(lm_head, x, w_head),
    "dense_stack_ms": timed(dense_stack, x, wd, wm, wm2),
    "logits_pass_ms": timed(logits_pass, logits),
}
res["sum_ms"] = round(sum(res.values()), 3)
print(json.dumps(res))
