"""Experiment: STRise scoring batch size sweep (f32, 6500 masks)."""
import time

import numpy as np


def main():
    from xfr_tpu.blackbox import STRise
    from xfr_tpu.models import create_wbnet

    wb = create_wbnet("resnetv4_pytorch")
    rng = np.random.RandomState(0)
    probe = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gal = [(rng.rand(224, 224, 3) * 255).astype(np.uint8) for _ in range(2)]

    base = None
    for bs in (64, 128, 256, 512):
        s = STRise(probe=probe, refs=refs, gallery=gal,
                   black_box="resnetv4_pytorch",
                   net_dict={("resnetv4_pytorch", 6): wb},
                   prior_type="uniform", num_masks=6500, mask_scale=12,
                   num_mask_elements=2, seed=0, batch_size=bs)
        s.evaluate()
        t0 = time.time()
        for _ in range(3):
            s.score_masks()
        dt = (time.time() - t0) / 3
        print(f"batch_size={bs:4d}: score_masks {dt*1000:6.0f} ms")
        if base is None:
            base = np.array(s.masked_probe_ref_scores)
        else:
            d = np.abs(np.array(s.masked_probe_ref_scores) - base)
            print(f"   score delta vs bs=64: max {d.max():.2e}")


if __name__ == "__main__":
    main()
