#!/usr/bin/env python
"""On-device kernel self-check (run on a real TPU host).

The pytest suite runs on the CPU interpreter (tests/conftest.py pins
JAX_PLATFORMS=cpu), which exercises all kernel *math* but cannot observe
device-only semantics — e.g. Mosaic's ``prng_random_bits`` returning SIGNED
int32 (a signedness slip there silently turned dropout rate 0.3 into an
effective 0.8 during development).  This tool pins those behaviors on the
actual chip:

1. eval flash attention == XLA attention (fwd),
2. flash-train rate=0 fwd+grad == XLA,
3. flash-train dropout: deterministic per rng key, rng-sensitive,
4. realized keep fraction == 1 - rate (mask extracted via an identity-value
   probe: q=k=0 makes attention uniform, v=I turns the output into the
   dropped probability matrix itself),
5. dropout mean-preservation (E[out] tracks the no-dropout output),
6. fused FFN-train kernel: rate=0 fwd+grad == XLA tail, dropout
   deterministic per key / rng-sensitive, hidden-dropout keep fraction via
   a linear probe (identity LN/weights make the output an affine image of
   the dropped hidden activations).

Exit code 0 = all checks pass.  Usage: python tools/selfcheck_tpu.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from i2rnet_tpu.ops.attention import masked_mhsa_xla
from i2rnet_tpu.ops.pallas.mhsa import masked_mhsa_pallas
from i2rnet_tpu.ops.pallas.mhsa_train import masked_mhsa_train

FAIL = []


def check(name, ok, detail=""):
    print(f"[{'ok' if ok else 'FAIL'}] {name} {detail}")
    if not ok:
        FAIL.append(name)


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    b, s, c, h = 4, 300, 128, 4
    q = jnp.asarray(rng.randn(b, s, c), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, s, c), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, s, c), jnp.bfloat16)
    mask = jnp.asarray(rng.rand(b, s) > 0.8)

    # 1. eval kernel vs XLA
    oe = np.asarray(jax.jit(lambda: masked_mhsa_pallas(q, k, v, h, mask))(),
                    np.float32)
    ox = np.asarray(jax.jit(lambda: masked_mhsa_xla(q, k, v, h, mask))(),
                    np.float32)
    d = np.abs(oe - ox).max()
    check("eval kernel fwd vs XLA", d < 0.05, f"max diff {d:.4f}")

    # 2. train kernel rate=0 fwd+grad vs XLA
    f_k = jax.jit(lambda a, bb, cc: jnp.sum(
        masked_mhsa_train(a, bb, cc, h, key_padding_mask=mask) ** 2))
    f_x = jax.jit(lambda a, bb, cc: jnp.sum(
        masked_mhsa_xla(a, bb, cc, h, mask) ** 2))
    vk, gk = jax.value_and_grad(f_k, argnums=(0, 1, 2))(q, k, v)
    vx, gx = jax.value_and_grad(f_x, argnums=(0, 1, 2))(q, k, v)
    rel = abs(float(vk) - float(vx)) / abs(float(vx))
    check("train kernel rate=0 value vs XLA", rel < 1e-3, f"rel {rel:.2e}")
    for n, a, bb in zip("qkv", gk, gx):
        dd = float(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32)).max())
        sc = float(jnp.abs(bb.astype(jnp.float32)).max())
        check(f"train kernel rate=0 d{n} vs XLA", dd < 0.05 * max(sc, 1.0),
              f"max diff {dd:.4f} scale {sc:.2f}")

    # 3. determinism / rng sensitivity
    fn = jax.jit(lambda key: masked_mhsa_train(
        q, k, v, h, key_padding_mask=mask, dropout_rate=0.1, dropout_rng=key))
    o1 = np.asarray(fn(jax.random.PRNGKey(7)).astype(jnp.float32))
    o2 = np.asarray(fn(jax.random.PRNGKey(7)).astype(jnp.float32))
    o3 = np.asarray(fn(jax.random.PRNGKey(8)).astype(jnp.float32))
    check("dropout deterministic per key", np.array_equal(o1, o2))
    check("dropout rng-sensitive", not np.array_equal(o1, o3))

    # 4. realized keep fraction via identity probe
    s2 = c2 = 128
    z = jnp.zeros((1, s2, c2), jnp.float32)
    eye = jnp.eye(s2, dtype=jnp.float32)[None]
    for rate in (0.1, 0.3, 0.5):
        probe = jax.jit(lambda key, r=rate: masked_mhsa_train(
            z, z, eye, 1, dropout_rate=r, dropout_rng=key))
        keep = np.mean([
            (np.asarray(probe(jax.random.PRNGKey(i))[0]) > 1e-6).mean()
            for i in range(4)])
        check(f"keep fraction at rate={rate}", abs(keep - (1 - rate)) < 0.02,
              f"measured {keep:.3f}")

    # 5. mean preservation: uniform attention, E[out] ~= mean of v rows
    vv = jnp.asarray(rng.randn(1, s2, c2), jnp.float32)
    probe = jax.jit(lambda key: masked_mhsa_train(
        z, z, vv, 1, dropout_rate=0.3, dropout_rng=key))
    mean = np.mean([np.asarray(probe(jax.random.PRNGKey(i)))
                    for i in range(24)], axis=0)
    ref = np.asarray(vv).mean(axis=1, keepdims=True).repeat(s2, 1)
    err = np.abs(mean - ref).max() / max(np.abs(ref).max(), 1e-6)
    check("dropout mean preservation", err < 0.5, f"rel err {err:.3f}")

    # 6. fused FFN-train kernel on device
    from i2rnet_tpu.ops.pallas.encoder_ffn_train import encoder_ffn_train
    cc, ff = 96, 192
    x = jnp.asarray(rng.randn(2, 700, cc), jnp.float32)
    fp = (jnp.asarray(rng.rand(cc) + 0.5, jnp.float32),
          jnp.asarray(rng.randn(cc) * 0.1, jnp.float32),
          jnp.asarray(rng.randn(cc, ff) * 0.05, jnp.float32),
          jnp.asarray(rng.randn(ff) * 0.1, jnp.float32),
          jnp.asarray(rng.randn(ff, cc) * 0.05, jnp.float32),
          jnp.asarray(rng.randn(cc) * 0.1, jnp.float32),
          jnp.asarray(rng.rand(cc) + 0.5, jnp.float32),
          jnp.asarray(rng.randn(cc) * 0.1, jnp.float32))

    def xla_tail(x, *p):
        n1s, n1b, w1, b1, w2, b2, n2s, n2b = p

        def ln(v, g, bb):
            m = v.mean(-1, keepdims=True)
            var = ((v - m) ** 2).mean(-1, keepdims=True)
            return (v - m) * jax.lax.rsqrt(var + 1e-5) * g + bb

        n = ln(x, n1s, n1b)
        return ln(n + jnp.maximum(n @ w1 + b1, 0.0) @ w2 + b2, n2s, n2b)

    fk = jax.jit(lambda x, *p: jnp.sum(
        encoder_ffn_train(x, *p, 0.0) ** 2))
    fx = jax.jit(lambda x, *p: jnp.sum(xla_tail(x, *p) ** 2))
    vk, gk = jax.value_and_grad(fk, argnums=tuple(range(9)))(x, *fp)
    vx, gx = jax.value_and_grad(fx, argnums=tuple(range(9)))(x, *fp)
    rel = abs(float(vk) - float(vx)) / abs(float(vx))
    check("ffn-train rate=0 value vs XLA", rel < 1e-3, f"rel {rel:.2e}")
    for n, a, bb in zip(["x", "n1s", "n1b", "w1", "b1", "w2", "b2", "n2s",
                         "n2b"], gk, gx):
        dd = float(jnp.abs(a - bb).max())
        sc = float(jnp.abs(bb).max())
        check(f"ffn-train rate=0 d{n} vs XLA", dd < 1e-2 * max(sc, 1.0),
              f"max diff {dd:.2e} scale {sc:.2f}")

    fdrop = jax.jit(lambda key: encoder_ffn_train(
        x, *fp, 0.3, dropout_rng=key))
    o1 = np.asarray(fdrop(jax.random.PRNGKey(3)))
    o2 = np.asarray(fdrop(jax.random.PRNGKey(3)))
    o3 = np.asarray(fdrop(jax.random.PRNGKey(4)))
    check("ffn-train dropout deterministic per key", np.array_equal(o1, o2))
    check("ffn-train dropout rng-sensitive", not np.array_equal(o1, o3))

    # output-dropout keep-fraction probe: w1=w2=0, b2=1e3 -> y is the huge
    # constant b2, so z = n + 1e3*inv*mask2 and after LN2 (scale 1, bias 0)
    # kept channels normalize to large POSITIVE, dropped to negative — the
    # output sign reads mask2 directly (both masks share _keep/_threshold,
    # the signedness-bug class this tool exists to pin)
    xs = jnp.asarray(rng.randn(1, 1024, cc), jnp.float32)
    ones = jnp.ones((cc,))
    zer = jnp.zeros((cc,))
    for rate in (0.1, 0.3, 0.5):
        probe = jax.jit(lambda key, r=rate: encoder_ffn_train(
            xs, ones, zer, jnp.zeros((cc, ff)), jnp.zeros((ff,)),
            jnp.zeros((ff, cc)), 1e3 * ones, ones, zer, r,
            dropout_rng=key))
        keep = np.mean([
            (np.asarray(probe(jax.random.PRNGKey(i))[0]) > 0).mean()
            for i in range(4)])
        check(f"ffn-train keep fraction at rate={rate}",
              abs(keep - (1 - rate)) < 0.02, f"measured {keep:.3f}")

    print("PASS" if not FAIL else f"FAILED: {FAIL}")
    return 1 if FAIL else 0


if __name__ == "__main__":
    sys.exit(main())
