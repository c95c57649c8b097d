"""Experiment: validity density + dynamic top-N chunk sweep cost vs the
full static sweep (exactness-preserving wsebp speedup candidate)."""
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from xfr_tpu.models import create_wbnet

    wb = create_wbnet("resnetv6_pytorch")
    wb.wsebp_dtype = jnp.bfloat16
    wb._ebp_subtree_mode = "norelu"
    rng = np.random.RandomState(0)
    em = rng.rand(512).astype(np.float32)
    en = rng.rand(512).astype(np.float32)
    em /= np.linalg.norm(em)
    en /= np.linalg.norm(en)
    wb.net.set_triplet_classifier(em, en)

    x = jnp.asarray(rng.rand(1, 3, 224, 224) * 50, jnp.float32)
    Pn_pos = wb._onehot(0)

    scores, idxs, vals = wb._wsebp_grad_fn()(
        wb.net.params, x, Pn_pos, gating=True)
    scores = np.asarray(scores, np.float32)
    idxs = np.asarray(idxs)
    vals = np.asarray(vals, np.float32)
    n_cand = scores.shape[0]
    print("n_cand", n_cand, "zero inj vals:", int((vals == 0).sum()))

    # full static sweep -> validity stats
    sweep = wb._wsebp_sweep_fn()
    P_out, maxes = sweep(wb.net.params, x,
                         jnp.asarray(idxs.astype(np.int32)),
                         jnp.asarray(vals))
    maxes = np.asarray(maxes)
    valid = (maxes > 0) & (np.arange(n_cand) != 1)
    print("valid:", int(valid.sum()), "/", n_cand)
    order = np.argsort(scores, kind="stable")[::-1]  # descending
    for N in (40, 48, 64, 96, 128):
        print(f"top-{N} by score: {int(valid[order[:N]].sum())} valid")

    def t(label, f, n=5):
        f()
        t0 = time.time()
        for _ in range(n):
            out = f()
        print(f"{label:44s} {(time.time()-t0)/n*1000:8.1f} ms")
        return out

    t("full static sweep (378 rows, nb=12)",
      lambda: np.asarray(sweep(wb.net.params, x,
                               jnp.asarray(idxs.astype(np.int32)),
                               jnp.asarray(vals))[1]))

    inject = wb._wsebp_inject_fn()
    for N in (48, 64):
        ev = order[:N].astype(np.int32)
        el = idxs[ev].astype(np.int32)
        vv = vals[ev]
        t(f"dynamic chunk sweep ({N} rows, full walk)",
          lambda ev=ev, el=el, vv=vv: np.asarray(
              inject(wb.net.params, x, jnp.asarray(ev), jnp.asarray(el),
                     jnp.asarray(vv))[1]))

    # bucketed dynamic: restrict walk with a static start_node covering
    # the chunk (cheap upper bound: max fire node of chunk rows)
    ev_node = wb.net.graph.event_node
    for N in (48, 64):
        ev = order[:N]
        sn = int(max(ev_node[int(e)] for e in ev))
        inj_b = wb._wsebp_inject_fn(start_node=sn)
        ev32 = ev.astype(np.int32)
        el = idxs[ev].astype(np.int32)
        vv = vals[ev]
        print(f"  (top-{N} chunk max fire node = {sn}, "
              f"graph n_nodes ~ {max(ev_node)+1})")
        t(f"dynamic chunk sweep ({N} rows, start_node={sn})",
          lambda ev32=ev32, el=el, vv=vv, inj_b=inj_b: np.asarray(
              inj_b(wb.net.params, x, jnp.asarray(ev32), jnp.asarray(el),
                    jnp.asarray(vv))[1]))


if __name__ == "__main__":
    main()
