"""Evaluation: cluster-vs-label contingency and classification error.

Parity with the reference's ``print_results`` (util_plots.py:269-299):
majority label per cluster; error = sum of non-majority assignments
over the total number of beats.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def print_results(model, labels: Sequence, n0: int = 0, error: bool = False,
                  purity: bool = False, quiet: bool = False):
    """model: an HDPGPC instance (uses .member_indexes() and .T_count)."""
    member_idx = model.member_indexes()
    M = len(member_idx)
    main_model: List = ["None"] * M
    for i in range(M):
        labs, counts = np.unique([labels[j + n0] for j in member_idx[i]],
                                 return_counts=True)
        sr = "[" + ",".join(f"{l}-{c}" for l, c in zip(labs, counts)) + "]"
        mm = ""
        if len(counts) > 0:
            main_model[i] = labs[np.argmax(counts)]
            mm = ": MainModel: " + str(main_model[i])
        if not quiet:
            print("Model", i + 1, mm, ":", sr)
    err = np.zeros(M)
    for m in range(M):
        for i in member_idx[m]:
            if labels[i + n0] != main_model[m]:
                err[m] += 1
        if purity and len(member_idx[m]) > 0 and not quiet:
            print("Model", m + 1, ": Purity: ",
                  1 - err[m] / len(member_idx[m]))
    total = model.T_count
    if not quiet:
        print(f"Classification error: {int(err.sum())} / {total} -- "
              f"{int(err.sum()) / total:.5f}")
    if purity:
        return main_model, int(err.sum()), total - int(err.sum())
    if error:
        return main_model, int(err.sum())
    return main_model


def classification_error(model, labels: Sequence, n0: int = 0
                         ) -> Tuple[int, int]:
    """(errors, total) without printing."""
    _, err = print_results(model, labels, n0, error=True, quiet=True)
    return err, model.T_count
