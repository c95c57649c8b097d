"""Inpainting-game saliency-map generation
(reference: python/xfr/inpainting_game/generate_whitebox_saliency.py and
generate_blackbox_saliency.py).

Per (net, subject, image, mask_id): load the filtered triplet table, build
mate/nonmate averaged encodings, set the 2-class triplet classifier, and
write one saliency overlay png + npz per method under the reference's exact
method-slug filename conventions (parsed back at analysis time).
"""

from __future__ import annotations

import os
import time

import numpy as np

import xfr_tpu
from xfr_tpu.show import create_save_smap, smap_cached
from xfr_tpu.utils.image import image_loader

ORIG_PATTERN = ("aligned/{SUBJECT_ID}/{ORIGINAL_BASENAME}/inpainted/"
                "{MASK_ID:05d}_truth.png")
INPAINTED_PATTERN = ("aligned/{SUBJECT_ID}/{ORIGINAL_BASENAME}/inpainted/"
                     "{MASK_ID:05d}_out_0.png")
MASK_PATTERN = "aligned/{SUBJECT_ID}/{ORIGINAL_BASENAME}/masks/{MASK_ID:05d}.png"


def shorten_subtree_mode(ebp_subtree_mode):
    if ebp_subtree_mode == "affineonly_with_prior":
        return "awp"
    return ebp_subtree_mode


def _avg_encodings(wb, im_mates, im_nonmates):
    """Average + L2-normalize mate/nonmate encodings
    (reference: generate_whitebox_saliency.py:85-98).

    Goes through ``embeddings`` (padded to wb.batch_size) so every job
    reuses one compiled encode shape — raw per-job stack sizes would
    trigger a fresh XLA compile per distinct mate/nonmate count."""
    import jax.numpy as jnp

    x = jnp.concatenate([wb.convert_from_numpy(im)
                         for im in list(im_mates) + list(im_nonmates)])
    e = wb.embeddings(np.asarray(x), norm=False)
    e = e.reshape(e.shape[0], -1)
    em = e[:len(im_mates)].mean(axis=0)
    en = e[len(im_mates):].mean(axis=0)
    return em / np.linalg.norm(em), en / np.linalg.norm(en)


def mean_ebp(wb, probe_im, net_name=None, ebp_version=None, device=None):
    """Mean EBP over all classes (uniform output prior)
    (reference: generate_whitebox_saliency.py:207-214).

    The reference builds a fresh net per job, so meanEBP always runs over
    the ORIGINAL full classifier; restore it in case a previous method on
    this shared engine installed a 2-class triplet head."""
    import jax.numpy as jnp

    wb.net.reset_classifier()
    x_probe = wb.convert_from_numpy(probe_im)
    P = jnp.ones((1, wb.net.num_classes()), jnp.float32)
    return wb.ebp(x_probe, P)


def run_contrastive_triplet_ebp(wb, im_mates, im_nonmates, probe_im,
                                truncate_percent, net_name=None,
                                ebp_version=None, device=None):
    """(Truncated-)contrastive triplet EBP
    (reference: generate_whitebox_saliency.py:79-115)."""
    avg_x_mate, avg_x_nonmate = _avg_encodings(wb, im_mates, im_nonmates)
    img_probe = wb.convert_from_numpy(probe_im)
    wb.net.set_triplet_classifier((1.0 / 2500.0) * avg_x_mate,
                                  (1.0 / 2500.0) * avg_x_nonmate)
    if truncate_percent is None:
        return wb.contrastive_ebp(img_probe, k_poschannel=0, k_negchannel=1)
    return wb.truncated_contrastive_ebp(
        img_probe, k_poschannel=0, k_negchannel=1,
        percentile=truncate_percent)


# ebp_version -> weighted-subtree flags
# (reference: generate_whitebox_saliency.py:148-195, whitebox.py:267-271)
_WSEBP_FLAGS = {
    7: dict(do_max_subtree=True, do_mated_similarity_gating=True),
    8: dict(do_max_subtree=False, do_mated_similarity_gating=True),
    9: dict(do_max_subtree=True, do_mated_similarity_gating=False),
    10: dict(do_max_subtree=True, do_mated_similarity_gating=True),
    11: dict(do_max_subtree=True, do_mated_similarity_gating=True),
    12: dict(do_max_subtree=False, do_mated_similarity_gating=True),
}


def run_weighted_subtree_triplet_ebp(wb, im_mates, im_nonmates, probe_im,
                                     subtree_mode_weighted, topk=1,
                                     net_name=None, ebp_version=None,
                                     device=None, max_candidates=None):
    """Weighted-subtree triplet EBP
    (reference: generate_whitebox_saliency.py:119-205)."""
    avg_x_mate, avg_x_nonmate = _avg_encodings(wb, im_mates, im_nonmates)
    img_probe = wb.convert_from_numpy(probe_im)
    wb.net.set_triplet_classifier(avg_x_mate, avg_x_nonmate)

    flags = _WSEBP_FLAGS.get(ebp_version,
                             dict(do_max_subtree=False,
                                  do_mated_similarity_gating=False))
    img_subtree, _, _, _ = wb.weighted_subtree_ebp(
        img_probe, k_poschannel=0, k_negchannel=1, topk=topk,
        subtree_mode=subtree_mode_weighted, verbose=False,
        max_candidates=max_candidates, return_subtree_maps=False, **flags)
    return img_subtree


def _load_triplet(net_name, subj_id, mask_id, img_base, data_dir=None):
    """Read the filtered-masks CSV and resolve file lists
    (reference: generate_whitebox_saliency.py:244-286)."""
    import pandas as pd

    data_dir = data_dir or xfr_tpu.inpaintgame2_dir
    orig_image_pattern = os.path.join(data_dir, ORIG_PATTERN)
    inpainted_image_pattern = os.path.join(data_dir, INPAINTED_PATTERN)
    mask_pattern = os.path.join(data_dir, MASK_PATTERN)

    data = pd.read_csv(os.path.join(
        data_dir,
        "filtered_masks_threshold-{NET}.csv".format(NET=net_name)))
    data = data.loc[(data["MASK_ID"] == int(mask_id)) &
                    (data["SUBJECT_ID"] == int(subj_id))]

    probe_rows, probes, mates, nonmates = [], [], [], []
    probe_masks = []
    for _, row in data.iterrows():
        d = row.to_dict()
        f = orig_image_pattern.format(**d)
        fm = mask_pattern.format(**d)
        finp = inpainted_image_pattern.format(**d)
        if os.path.exists(f):
            if d["TRIPLET_SET"] == "REF":
                mates.append(f)
            elif d["ORIGINAL_BASENAME"] == img_base:
                probe_rows.append(row)
                probes.append(f)
                probe_masks.append(fm)
        else:
            print("Original file %s does not exist!" % f)
        if d["TRIPLET_SET"] == "REF":
            assert os.path.exists(finp)
            nonmates.append(finp)

    assert len(probes) == 1
    return pd.DataFrame(probe_rows), probes, probe_masks, mates, nonmates


def generate_wb_smaps(wb, net_name, img_base, subj_id, mask_id,
                      subtree_mode_weighted, ebp_ver, overwrite,
                      device=None, method=None, wsebp_max_candidates=None,
                      data_dir=None, smaps_dir=None):
    """Generate all whitebox method maps for one (net, subject, image, mask)
    (reference: generate_whitebox_saliency.py:222-417)."""
    subject_id = subj_id
    data_dir = data_dir or xfr_tpu.inpaintgame2_dir
    smaps_dir = smaps_dir or xfr_tpu.inpaintgame_saliencymaps_dir
    cropped_data_dir = os.path.join(data_dir,
                                    "aligned/{}".format(subject_id))
    multiprobe_data_dir = os.path.join(
        smaps_dir,
        "{}/subject_ID_{}".format(net_name, subject_id))

    probe_data, probes, probe_masks, mates, nonmates = _load_triplet(
        net_name, subject_id, mask_id, img_base, data_dir=data_dir)
    im_mates = list(image_loader(mates))
    im_nonmates = list(image_loader(nonmates))

    dev_tag = "cpu" if device is None else str(device)

    for (probe_im, probe_fn), probe_mask_fn, (_, probe_row) in zip(
            image_loader(probes, returnFileName=True), probe_masks,
            probe_data.iterrows()):
        extra_dirs = os.path.split(
            os.path.relpath(probe_fn, cropped_data_dir))[0]
        output_dir = os.path.join(multiprobe_data_dir, extra_dirs)
        os.makedirs(output_dir, exist_ok=True)
        mask_im = next(iter(image_loader([probe_mask_fn])))

        result_calculated = False
        if method is None or method == "meanEBP":
            result_calculated = True
            fn = "meanEBP_mode=%s_v%02d_%s" % (
                shorten_subtree_mode(wb.ebp_subtree_mode()), ebp_ver,
                dev_tag)
            create_save_smap(
                fn, output_dir, overwrite,
                smap_fn=lambda: mean_ebp(wb, probe_im,
                                         ebp_version=ebp_ver),
                probe_im=probe_im, probe_info=probe_row, mask_im=mask_im,
                mask_id=mask_id)

        if method is None or method == "contrastive":
            result_calculated = True
            for truncate_percent in [None, 20]:
                if truncate_percent is None:
                    fn = "contrastive_triplet_ebp_mode=%s_v%02d_%s" % (
                        shorten_subtree_mode(wb.ebp_subtree_mode()),
                        ebp_ver, dev_tag)
                else:
                    fn = ("trunc_contrastive_triplet_ebp_mode=%s_v%02d_"
                          "pct%d_%s" % (
                              shorten_subtree_mode(wb.ebp_subtree_mode()),
                              ebp_ver, truncate_percent, dev_tag))
                create_save_smap(
                    fn, output_dir, overwrite,
                    smap_fn=lambda tp=truncate_percent:
                        run_contrastive_triplet_ebp(
                            wb, im_mates, im_nonmates, probe_im,
                            truncate_percent=tp, ebp_version=ebp_ver),
                    probe_im=probe_im, probe_info=probe_row,
                    mask_im=mask_im, mask_id=mask_id)

        if method is None or method == "weighted-subtree":
            result_calculated = True
            for topk in [32]:
                fn = ("weighted_subtree_triplet_ebp_mode=%s,%s_v%02d_"
                      "top%d_%s" % (
                          shorten_subtree_mode(wb.ebp_subtree_mode()),
                          shorten_subtree_mode(subtree_mode_weighted),
                          ebp_ver, topk, dev_tag))
                create_save_smap(
                    fn, output_dir, overwrite,
                    smap_fn=lambda tk=topk: run_weighted_subtree_triplet_ebp(
                        wb, im_mates, im_nonmates, probe_im,
                        subtree_mode_weighted=subtree_mode_weighted,
                        topk=tk, ebp_version=ebp_ver,
                        max_candidates=wsebp_max_candidates),
                    probe_im=probe_im, probe_info=probe_row,
                    mask_im=mask_im, mask_id=mask_id)

        if not result_calculated:
            raise RuntimeError(
                "Unknown method type %s (valid types: 'meanEBP', "
                "'contrastive', 'weighted-subtree')" % method)


def create_bbox(blackbox_fn, probe_im, mates, nonmates, rise_scale,
                num_mask_elements, mask_fill_type, blur_sigma_percent,
                device=None, num_masks=6500, seed=0,
                prior_type="mean_ebp", mesh=None, score_precision=None):
    """STRise closure for one probe (reference:
    generate_blackbox_saliency.py:48-73)."""
    def build():
        from xfr_tpu.blackbox import STRise

        kwargs = dict(
            probe=probe_im, refs=mates, gallery=nonmates,
            mask_scale=rise_scale,
            num_mask_elements=num_mask_elements,
            mask_fill_type=mask_fill_type,
            blur_fill_sigma_percent=blur_sigma_percent,
            num_masks=num_masks, seed=seed, prior_type=prior_type,
            mesh=mesh, score_precision=score_precision)
        if isinstance(blackbox_fn, str):
            # builtin matcher name: the fused on-device scorer (embeds each
            # masked probe once for both galleries)
            return STRise(black_box=blackbox_fn, **kwargs)
        elif isinstance(blackbox_fn, tuple):
            name, net_dict = blackbox_fn
            return STRise(black_box=name, net_dict=net_dict, **kwargs)
        return STRise(black_box_fn=blackbox_fn, **kwargs)

    def bbox():
        strise = build()
        strise.evaluate()
        return strise.saliency_map

    bbox.launch = lambda: build().launch_evaluate()
    return bbox


class BBPipeline:
    """Cross-job double-buffer for blackbox generation.

    Holds at most one pending finish+write closure: pushing job k+1's
    writer first LAUNCHES k+1's device programs, then drains job k — so
    job k's score transfers, saliency post-processing and png/npz writes
    overlap job k+1's device queue.  A single generate_bb_smaps call uses
    a local instance; the CLI driver threads one instance through all its
    jobs to pipeline across (subject, mask, image) boundaries.

    A pending map's failure is recorded in ``failures`` under its own
    label instead of raising — the drain happens during a LATER map's
    push, and raising there would both misattribute the error and abort
    that later map's remaining work."""

    def __init__(self):
        self._pend = None
        self.failures = []  # (label, repr(exception))

    def push(self, writer, label=None):
        prev, self._pend = self._pend, (label, writer)
        if prev is not None:
            self._run(prev)

    def drain(self):
        if self._pend is not None:
            prev, self._pend = self._pend, None
            self._run(prev)

    def _run(self, item):
        label, writer = item
        try:
            writer()
        except Exception as e:  # recorded, never propagated cross-map
            print("Blackbox map failed: %s (%s)" % (label, e))
            self.failures.append((label, repr(e)))


def generate_bb_smaps(bb_score_fn, convert_from_numpy, net_name, img_base,
                      subj_id, mask_id, ebp_ver, overwrite, device=None,
                      rise_scale=12, num_masks=6500, data_dir=None,
                      smaps_dir=None, prior_type="mean_ebp", mesh=None,
                      pipeline=None, score_precision=None):
    """Generate the blackbox RISE map for one (net, subject, image, mask)
    (reference: generate_blackbox_saliency.py:76-227).

    ``pipeline``: optional BBPipeline shared across calls; when omitted a
    local one is created and fully drained before returning."""
    subject_id = subj_id
    data_dir = data_dir or xfr_tpu.inpaintgame2_dir
    smaps_dir = smaps_dir or xfr_tpu.inpaintgame_saliencymaps_dir
    cropped_data_dir = os.path.join(data_dir,
                                    "aligned/{}".format(subject_id))
    multiprobe_data_dir = os.path.join(
        smaps_dir,
        "{}/subject_ID_{}".format(net_name, subject_id))

    probe_data, probes, probe_masks, mates, nonmates = _load_triplet(
        net_name, subject_id, mask_id, img_base, data_dir=data_dir)

    # Double-buffered probe pipeline: probe k+1's STRise launches (prior,
    # mask sampling, and all fused scoring chunks enqueue on device)
    # BEFORE probe k's results are drained, so probe k's host
    # post-processing + png/npz writes overlap probe k+1's device queue.
    # The WB path gained the same structure in round 2
    # (generate_wb_smaps_batched); the reference runs strictly serially
    # (generate_blackbox_saliency.py:76-227).
    local = pipeline is None
    if local:
        pipeline = BBPipeline()

    mask_fill_type = "blur"
    blur_sigma_percent = 4
    try:
        for (probe_im, probe_fn), probe_mask_fn, (_, probe_row) in zip(
                image_loader(probes, returnFileName=True), probe_masks,
                probe_data.iterrows()):
            extra_dirs = os.path.split(
                os.path.relpath(probe_fn, cropped_data_dir))[0]
            output_dir = os.path.join(multiprobe_data_dir, extra_dirs)
            os.makedirs(output_dir, exist_ok=True)
            mask_im = next(iter(image_loader([probe_mask_fn])))

            for num_mask_elements in [2]:
                fn = "bbox-rise-%delem_%s=%d_scale_%s" % (
                    num_mask_elements, mask_fill_type, blur_sigma_percent,
                    rise_scale)
                if not overwrite and smap_cached(fn, output_dir, mask_id):
                    continue  # same skip create_save_smap would take
                t0 = time.time()
                finish = create_bbox(
                    blackbox_fn=bb_score_fn, probe_im=probe_im,
                    mates=mates, nonmates=nonmates, rise_scale=rise_scale,
                    num_mask_elements=num_mask_elements,
                    mask_fill_type=mask_fill_type,
                    blur_sigma_percent=blur_sigma_percent,
                    num_masks=num_masks, prior_type=prior_type,
                    mesh=mesh,
                    score_precision=score_precision).launch()

                def _write(finish=finish, fn=fn, output_dir=output_dir,
                           probe_im=probe_im, mask_im=mask_im,
                           probe_row=probe_row, t0=t0):
                    create_save_smap(
                        fn, output_dir, overwrite, smap_fn=finish,
                        probe_im=probe_im, mask_im=mask_im, mask_id=mask_id,
                        probe_info=probe_row)
                    dt = time.time() - t0
                    print("Time: %dm %fs" % (int(dt // 60), dt % 60))

                pipeline.push(_write, label="%s subj %s mask %s %s" % (
                    net_name, subj_id, mask_id, fn))
    finally:
        # a later probe's failure must not discard an earlier probe's
        # pending, fully-computed map
        if local:
            pipeline.drain()
    if local and pipeline.failures:
        raise RuntimeError("blackbox map(s) failed: %r"
                           % (pipeline.failures,))


def generate_wb_smaps_batched(wb, net_name, jobs, subtree_mode_weighted,
                              ebp_ver, overwrite, method=None,
                              wsebp_max_candidates=None, data_dir=None,
                              smaps_dir=None, batch_size=8, device=None):
    """Cross-job batched whitebox generation.

    ``jobs``: list of (subject_id, mask_id, img_base).  meanEBP and
    (truncated-)contrastive run as probe batches (one device launch per
    method per batch: meanEBP batches trivially over the shared full
    classifier; contrastive uses the interleaved per-probe classifier
    trick); weighted-subtree runs per probe.  Outputs are byte-identical in
    convention to generate_wb_smaps.
    """
    import jax.numpy as jnp

    data_dir = data_dir or xfr_tpu.inpaintgame2_dir
    smaps_dir = smaps_dir or xfr_tpu.inpaintgame_saliencymaps_dir
    dev_tag = "cpu" if device is None else str(device)

    # -- resolve jobs: triplet files, output dirs, cached-method filtering
    mode_slug = shorten_subtree_mode(wb.ebp_subtree_mode())
    slugs = {
        "meanEBP": "meanEBP_mode=%s_v%02d_%s" % (mode_slug, ebp_ver,
                                                 dev_tag),
        "contrastive": "contrastive_triplet_ebp_mode=%s_v%02d_%s"
                       % (mode_slug, ebp_ver, dev_tag),
        "trunc": "trunc_contrastive_triplet_ebp_mode=%s_v%02d_pct20_%s"
                 % (mode_slug, ebp_ver, dev_tag),
        "weighted-subtree":
            "weighted_subtree_triplet_ebp_mode=%s,%s_v%02d_top32_%s"
            % (mode_slug, shorten_subtree_mode(subtree_mode_weighted),
               ebp_ver, dev_tag),
    }

    want = {"meanEBP": method in (None, "meanEBP"),
            "contrastive": method in (None, "contrastive"),
            "trunc": method in (None, "contrastive"),
            "weighted-subtree": method in (None, "weighted-subtree")}

    # Light resolve: triplet CSV + paths + cached-method filtering only —
    # image loads, uploads and encodes are deferred to the group loop so
    # memory stays O(batch) instead of O(jobs).  A bad job (missing
    # probe row, unreadable CSV, ...) is recorded and skipped, like the
    # serial driver's per-job catch (reference pool semantics).
    pend, failures = [], []
    for (subj_id, mask_id, img_base) in jobs:
        try:
            probe_data, probes, probe_masks, mates, nonmates = \
                _load_triplet(net_name, subj_id, mask_id, img_base,
                              data_dir=data_dir)
            cropped = os.path.join(data_dir, "aligned/%s" % subj_id)
            outdir = os.path.join(
                smaps_dir, "%s/subject_ID_%s" % (net_name, subj_id),
                os.path.split(os.path.relpath(probes[0], cropped))[0])
            os.makedirs(outdir, exist_ok=True)
            # smap_cached (not a hand-rolled npz check): the overlay png
            # and npz are one cache unit, so an interrupted earlier run
            # regenerates instead of being skipped forever
            todo = {m: want[m] and (overwrite or
                                    not smap_cached(slugs[m], outdir,
                                                    mask_id))
                    for m in slugs}
            if not any(todo.values()):
                continue
            pend.append(dict(mask_id=mask_id, outdir=outdir,
                             probes=probes, probe_masks=probe_masks,
                             mates=mates, nonmates=nonmates,
                             probe_row=probe_data.iloc[0], todo=todo))
        except Exception as e:
            print("Job failed: %r (%s)" % ((subj_id, mask_id, img_base),
                                           e))
            failures.append(((subj_id, mask_id, img_base), repr(e)))

    def _needs_triplet(todo):
        return (todo["contrastive"] or todo["trunc"] or
                todo["weighted-subtree"])

    def _resolve(j):
        """Load one job's images / device tensors (deferred heavy half of
        the resolve).  em/en encode only when a triplet method needs
        them — a meanEBP-only invocation skips the mate/nonmate image
        loads and the padded device encode entirely."""
        j["probe_im"] = next(iter(image_loader(j.pop("probes"))))
        j["mask_im"] = next(iter(image_loader(j.pop("probe_masks"))))
        mates, nonmates = j.pop("mates"), j.pop("nonmates")
        if _needs_triplet(j["todo"]):
            j["em"], j["en"] = _avg_encodings(
                wb, list(image_loader(mates)),
                list(image_loader(nonmates)))
        j["x"] = wb.convert_from_numpy(j["probe_im"])
        return j

    def _write(j, slug_key, smap):
        create_save_smap(
            slugs[slug_key], j["outdir"], True, smap_fn=lambda: smap,
            probe_im=j["probe_im"], probe_info=j["probe_row"],
            mask_im=j["mask_im"], mask_id=j["mask_id"])

    flags = _WSEBP_FLAGS.get(ebp_ver,
                             dict(do_max_subtree=False,
                                  do_mated_similarity_gating=False))

    def _launch(group):
        """Enqueue every method's device programs for one job group.

        Launch-all-then-drain: nothing syncs here, so host work and
        per-sync device-link round trips overlap with the device queue.
        Classifier swaps between launches are safe: each launch captures
        the params it was given.

        Tail groups pad to the canonical batch size by DUPLICATING the
        first job: every launch then reuses ONE compiled shape (a fresh
        shape costs a multi-minute remote XLA compile of the sweep
        program, vastly more than the discarded duplicate compute).
        Duplicate rows produce valid results, so every finish() path is
        safe; zip(group, ...) discards the extras."""
        padded = group + [group[0]] * (batch_size - len(group))
        x = jnp.concatenate([j["x"] for j in padded])
        Bp = len(padded)

        pooled_dev = None
        if any(j["todo"]["meanEBP"] for j in group):
            wb.net.reset_classifier()
            Pn = jnp.ones((Bp, wb.net.num_classes()), jnp.float32)
            pooled_dev, _ = wb._ebp_pooled_fn()(wb.net.params, x, Pn)

        def _embed_stacks():
            # meanEBP-only jobs skipped their em/en encode; their rows in
            # a mixed group carry any valid pair (results discarded by
            # the per-job todo gates in _drain, exactly like the padding
            # duplicates)
            em0 = next(j["em"] for j in group if "em" in j)
            en0 = next(j["en"] for j in group if "en" in j)
            return (np.stack([j.get("em", em0) for j in padded]),
                    np.stack([j.get("en", en0) for j in padded]))

        finish_ct = None
        if any(j["todo"]["contrastive"] for j in group) or \
                any(j["todo"]["trunc"] for j in group):
            ems, ens = _embed_stacks()
            wb.set_triplet_classifier_batch(ems / 2500.0, ens / 2500.0)
            finish_ct = wb.launch_contrastive_ebp_batch_both(
                x, truncate_percent=20)

        finish_ws = None
        if any(j["todo"]["weighted-subtree"] for j in group) and \
                wsebp_max_candidates is None:
            # batched ranking pass + scan-batched static sweeps
            ems, ens = _embed_stacks()
            wb.set_triplet_classifier_batch(ems, ens)
            finish_ws = wb.launch_weighted_subtree_ebp_batch(
                x, topk=32, subtree_mode=subtree_mode_weighted,
                verbose=False, **flags)

        return dict(group=group, x=x, pooled_dev=pooled_dev,
                    finish_ct=finish_ct, finish_ws=finish_ws)

    def _drain(st):
        """Fetch one group's results and write the png/npz outputs."""
        group = st["group"]
        if st["pooled_dev"] is not None:
            pooled = np.asarray(st["pooled_dev"], np.float32)
            for i, j in enumerate(group):
                if j["todo"]["meanEBP"]:
                    _write(j, "meanEBP", wb._mwp_to_saliency(pooled[i]))
        if st["finish_ct"] is not None:
            cons, truncs = st["finish_ct"]()
            for i, j in enumerate(group):
                if j["todo"]["contrastive"]:
                    _write(j, "contrastive", cons[i])
                if j["todo"]["trunc"]:
                    _write(j, "trunc", truncs[i])
        if st["finish_ws"] is not None:
            for j, (smap, _, _, _) in zip(group, st["finish_ws"]()):
                if j["todo"]["weighted-subtree"]:
                    _write(j, "weighted-subtree", smap)

        if any(j["todo"]["weighted-subtree"] for j in group) and \
                wsebp_max_candidates is not None:
            # bounded-candidate fast path stays per-probe (dynamic
            # candidate subset -> traced-injection sweep)
            for i, j in enumerate(group):
                if not j["todo"]["weighted-subtree"]:
                    continue
                wb.net.set_triplet_classifier(j["em"], j["en"])
                smap, _, _, _ = wb.weighted_subtree_ebp(
                    st["x"][i:i + 1], 0, 1, topk=32,
                    subtree_mode=subtree_mode_weighted, verbose=False,
                    max_candidates=wsebp_max_candidates,
                    return_subtree_maps=False, **flags)
                _write(j, "weighted-subtree", smap)

    def _fail_group(group, e, stage):
        print("Job group failed in %s: %s" % (stage, e))
        for j in group:
            failures.append(((j["probe_row"].get("SUBJECT_ID", "?"),
                              j["mask_id"]), repr(e)))

    # Double-buffer groups: group N's host drain (transfers + saliency
    # post + png/npz writes) runs while group N+1's programs execute on
    # device, so the device never idles on file IO between groups.
    # Failures stay group-local: a bad image or a device error drops that
    # group (recorded) and the run continues, like the serial driver.
    done = 0
    prev = None
    for lo in range(0, len(pend), batch_size):
        group = []
        for j in pend[lo:lo + batch_size]:
            try:
                group.append(_resolve(j))
            except Exception as e:
                print("Job failed: %s/%s (%s)" % (
                    j["probe_row"].get("SUBJECT_ID", "?"), j["mask_id"],
                    e))
                failures.append((("resolve", j["mask_id"]), repr(e)))
        st = None
        if group:
            try:
                st = _launch(group)
            except Exception as e:
                _fail_group(group, e, "launch")
        if prev is not None:
            try:
                _drain(prev)
                done += len(prev["group"])
            except Exception as e:
                _fail_group(prev["group"], e, "drain")
        prev = st
    if prev is not None:
        try:
            _drain(prev)
            done += len(prev["group"])
        except Exception as e:
            _fail_group(prev["group"], e, "drain")
    if failures:
        # completed maps are on disk; fail the run like the serial
        # driver's failure report (and the blackbox pipeline above)
        raise RuntimeError("whitebox job(s) failed: %r" % (failures,))
    return done
