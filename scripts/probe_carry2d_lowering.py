"""Tiny-shape lowering probe for the carry2d kernel frame construction.

The full carry2d kernel was rejected by the Mosaic toolchain at
1024x512x20. This compiles three frame-construction variants at a tiny
shape (L=4, 64x256 shard) to pinpoint the failing lowering:

  a) offset64  — the failing kernel's form: frame = block[..., 64:64+lx+128]
     (lane slice at offset 64, aligned width), jnp.pad output
  b) xpad128   — full-width frame, no lane slicing in the frame; jnp.pad
     output
  c) off64_out128 — offset-64 frame (a) but output rebuilt as
     concat([ones(128), core, ones(128)])
  d) control1d — the KNOWN-GOOD r4 1-D carry kernel
     (pe_rk4_pallas_carry) at a tiny shape: distinguishes a toolchain /
     session failure from a carry2d-structure failure
  e) x128_full — xpad128 frame + FULL-width store (ref[:] = rows slice;
     zero lane ops anywhere): isolates the frame construction
  f) off64_store — offset-64 frame + PARTIAL interior store
     (ref[:, :, 128:128+lx] = core): the output construction the real
     carry2d kernel should use if pad/concat outputs are the failing op
  g) x128_store — xpad128 frame + partial interior store

Prints one JSON line per variant: compiled + maxdiff vs the interpret
run of the same variant.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from njw_tpu.ops.pe_stencil import _pe_tend_values, _rk4_chain

    L, ly, lx, by = 4, 64, 256, 16
    for i, a in enumerate(sys.argv):
        if a == "--shape":  # L,ly,lx,by — size isolation (r5: the full
            # 1024x512x20 kernel fails where the tiny one compiles)
            L, ly, lx, by = (int(x) for x in sys.argv[i + 1].split(","))
            del sys.argv[i:i + 2]
            break
    W = lx + 256
    r = by // 8
    dt, dx, dy, f = 20.0, 1e5, 1e5, 1e-4

    def kern(u_c, u_t, u_b, v_c, v_t, v_b, T_c, T_t, T_b,
             q_c, q_t, q_b, ps_c, ps_t, ps_b,
             ou, ov, oT, oq, ops_, *, xpad, outmode):
        lo = 128 - xpad
        hi = 128 + lx + xpad

        def frame3(c, t, b):
            if xpad == 128:
                return jnp.concatenate([t[:, -4:, :], c[:], b[:, :4, :]], 1)
            return jnp.concatenate(
                [t[:, -4:, lo:hi], c[:, :, lo:hi], b[:, :4, lo:hi]], axis=1)

        def frame2(c, t, b):
            if xpad == 128:
                return jnp.concatenate([t[-4:, :], c[:], b[:4, :]], 0)
            return jnp.concatenate(
                [t[-4:, lo:hi], c[:, lo:hi], b[:4, lo:hi]], axis=0)

        s = (frame3(u_c, u_t, u_b), frame3(v_c, v_t, v_b),
             frame3(T_c, T_t, T_b), frame3(q_c, q_t, q_b),
             frame2(ps_c, ps_t, ps_b))
        tend = functools.partial(_pe_tend_values, L=L, dx=dx, dy=dy, f=f)
        out = _rk4_chain(s, tend, dt)

        def put(ref, val, nd3):
            if outmode == "full":
                # xpad==128 only: rows slice, no lane ops at all
                ref[:] = val[:, 4:4 + by, :] if nd3 else val[4:4 + by, :]
                return
            core = (val[:, 4:4 + by, xpad:xpad + lx] if nd3
                    else val[4:4 + by, xpad:xpad + lx])
            if outmode == "store":
                if nd3:
                    ref[:, :, 128:128 + lx] = core
                else:
                    ref[:, 128:128 + lx] = core
            elif outmode == "concat":
                ones = jnp.ones(core.shape[:-1] + (128,), core.dtype)
                ref[:] = jnp.concatenate([ones, core, ones], axis=-1)
            else:  # 'pad'
                padw = (((0, 0), (0, 0), (128, 128)) if nd3
                        else ((0, 0), (128, 128)))
                ref[:] = jnp.pad(core, padw, constant_values=1.0)

        put(ou, out[0], True)
        put(ov, out[1], True)
        put(oT, out[2], True)
        put(oq, out[3], True)
        put(ops_, out[4], False)

    c3 = pl.BlockSpec((L, by, W), lambda i: (0, i + 1, 0),
                      memory_space=pltpu.VMEM)
    t3 = pl.BlockSpec((L, 8, W), lambda i: (0, (i + 1) * r - 1, 0),
                      memory_space=pltpu.VMEM)
    b3 = pl.BlockSpec((L, 8, W), lambda i: (0, (i + 1) * r + r, 0),
                      memory_space=pltpu.VMEM)
    c2 = pl.BlockSpec((by, W), lambda i: (i + 1, 0),
                      memory_space=pltpu.VMEM)
    t2 = pl.BlockSpec((8, W), lambda i: ((i + 1) * r - 1, 0),
                      memory_space=pltpu.VMEM)
    b2 = pl.BlockSpec((8, W), lambda i: ((i + 1) * r + r, 0),
                      memory_space=pltpu.VMEM)
    sh3 = jax.ShapeDtypeStruct((L, ly + 2 * by, W), jnp.float32)
    sh2 = jax.ShapeDtypeStruct((ly + 2 * by, W), jnp.float32)

    rng = np.random.default_rng(0)
    mk3 = lambda: jnp.asarray(
        1.0 + 0.01 * rng.standard_normal((L, ly + 2 * by, W)), jnp.float32)
    ps0 = jnp.asarray(1000.0 + rng.standard_normal((ly + 2 * by, W)),
                      jnp.float32)
    ops_in = [mk3(), mk3(), mk3(), mk3(), ps0]

    import argparse
    apx = argparse.ArgumentParser()
    apx.add_argument("--variant", default=None,
                     help="run only this variant (fresh process per "
                          "variant: a failed compile can wedge the "
                          "remote session, poisoning later attempts)")
    apx.add_argument("--interpret-selfcheck", action="store_true",
                     help="run every variant in interpret mode only and "
                          "cross-compare interiors (CPU-safe harness "
                          "validation; no TPU compiles)")
    vargs = apx.parse_args()
    allv = (("offset64", 64, "pad"), ("xpad128", 128, "pad"),
            ("off64_out128", 64, "concat"), ("control1d", None, None),
            ("x128_full", 128, "full"), ("off64_store", 64, "store"),
            ("x128_store", 128, "store"))
    chosen = [v for v in allv if vargs.variant in (None, v[0])]

    if vargs.interpret_selfcheck:
        # CPU-safe harness validation: every kernel variant in interpret
        # mode, interiors cross-compared against the offset64 baseline.
        outs = {}
        for label, xpad, outmode in allv:
            if label == "control1d":
                continue
            k = functools.partial(kern, xpad=xpad, outmode=outmode)
            got = pl.pallas_call(
                k, grid=(ly // by,),
                in_specs=[c3, t3, b3] * 4 + [c2, t2, b2],
                out_specs=(c3, c3, c3, c3, c2),
                out_shape=(sh3, sh3, sh3, sh3, sh2),
                interpret=True,
            )(*(x for a in ops_in[:4] for x in (a, a, a)),
              ops_in[4], ops_in[4], ops_in[4])
            outs[label] = [np.asarray(g[..., by:by + ly, 128:128 + lx])
                           for g in got]
        base_lbl = "offset64"
        for label, vals in outs.items():
            md = max(float(np.max(np.abs(a - b)))
                     for a, b in zip(vals, outs[base_lbl]))
            print(json.dumps({"variant": label,
                              "maxdiff_vs_offset64": md}), flush=True)
        return

    for label, xpad, outmode in chosen:
        rec = {"variant": label}
        if label == "control1d":
            # known-good r4 kernel at a tiny 1-D-carry shape: if THIS
            # fails, the session/toolchain is the problem, not carry2d
            from njw_tpu.ops.pe_stencil import pe_rk4_pallas_carry

            pads = [mk3() for _ in range(4)] + [ps0]
            kw = dict(ly=ly, nx=W, L=L, by=by, dt=dt, coriolis_f=f,
                      dx=dx, dy=dy)
            try:
                got = pe_rk4_pallas_carry(*pads, **kw)
                ref = pe_rk4_pallas_carry(*pads, interpret=True, **kw)
                md = max(float(jnp.max(jnp.abs(
                    g[..., by:by + ly, :] - r_[..., by:by + ly, :])))
                    for g, r_ in zip(got, ref))
                rec["ok"] = True
                rec["maxdiff_vs_interpret"] = md
            except Exception as e:  # noqa: BLE001
                rec["error"] = f"{type(e).__name__}: {str(e)[:4000]}"
            print(json.dumps(rec), flush=True)
            continue
        k = functools.partial(kern, xpad=xpad, outmode=outmode)

        def call(interp):
            return pl.pallas_call(
                k,
                grid=(ly // by,),
                in_specs=[c3, t3, b3] * 4 + [c2, t2, b2],
                out_specs=(c3, c3, c3, c3, c2),
                out_shape=(sh3, sh3, sh3, sh3, sh2),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 << 20),
                interpret=interp,
            )(*(x for a in ops_in[:4] for x in (a, a, a)),
              ops_in[4], ops_in[4], ops_in[4])

        try:
            got = jax.jit(lambda: call(False))()
            ref = call(True)
            md = max(float(jnp.max(jnp.abs(
                g[..., by:by + ly, 128:128 + lx]
                - r_[..., by:by + ly, 128:128 + lx])))
                for g, r_ in zip(got, ref))
            rec["ok"] = True
            rec["maxdiff_vs_interpret"] = md
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {str(e)[:4000]}"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
