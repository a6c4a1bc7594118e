"""Randomized k-best model-selection parity vs the reference k_PriorityQueue.

Drives the ACTUAL reference class (misc/logger.py:81-211) and navc's
KBestQueue with identical random validation-metric sequences and asserts the
selection behavior matches step for step: the mutated relative 'Sum' score,
the early-stop decision and failure counter, and the set of kept epochs.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from misc.logger import k_PriorityQueue  # noqa: E402

from navc_tpu.runtime.logger import KBestQueue  # noqa: E402

METRICS = ["Bleu_4", "METEOR", "ROUGE_L", "CIDEr"]


def _random_res(rng, epoch):
    res = {k: float(rng.uniform(0.05, 0.9)) for k in METRICS}
    res["epoch"] = epoch
    return res


@pytest.mark.parametrize("seed,k_best", [(0, 1), (1, 3), (2, 3), (3, 5)])
def test_kbest_selection_parity(seed, k_best, tmp_path):
    rng = np.random.RandomState(seed)
    tol = int(rng.randint(3, 7))

    ref_dir = tmp_path / "ref"
    ref_folder = ref_dir / "kbest"
    ref_dir.mkdir()
    (ref_dir / "checkpoint.pth.tar").write_bytes(b"x")
    ref_q = k_PriorityQueue(k_best, str(ref_folder))
    opt = {"checkpoint_path": str(ref_dir), "tolerence": tol}

    my_dir = tmp_path / "mine"
    my_q = KBestQueue(k_best, folder_path=str(my_dir / "kbest"))
    my_dir.mkdir(exist_ok=True)

    for epoch in range(24):
        res = _random_res(rng, epoch)
        # occasional exact repeat of the current best metrics stresses the
        # rescore-to-1.0 path (every metric == its own best)
        if rng.rand() < 0.15 and epoch > 2:
            res = dict(ref_q.best_res)
            res.pop("Sum", None)
            res["epoch"] = epoch
            res = {k: v for k, v in res.items() if k in METRICS or k == "epoch"}

        ref_res = dict(res)
        my_res = dict(res)

        ref_keep, ref_info = ref_q.check(
            ref_res, opt, str(ref_dir / "best.pth.tar"),
            "model_%04d.pth.tar" % epoch)
        my_keep, my_info = my_q.check(
            my_res, str(my_dir), tol,
            save_fn=lambda dst: open(dst, "wb").write(b"x"))

        assert ref_keep == my_keep, (epoch, ref_info, my_info)
        np.testing.assert_allclose(my_res["Sum"], ref_res["Sum"], rtol=1e-12)
        assert (my_q.continuous_failed_count
                == ref_q.continuous_failed_count), epoch
        if not ref_keep:
            break

        ref_epochs = sorted(n.res["epoch"] for n in ref_q.queue.queue)
        my_epochs = sorted(r[2]["epoch"] for r in my_q.heap)
        assert ref_epochs == my_epochs, (epoch, ref_epochs, my_epochs)

    # the rescored best snapshot agrees too
    np.testing.assert_allclose(my_q.best_res.get("Sum", 0.0),
                               ref_q.best_res.get("Sum", 0.0), rtol=1e-12)
