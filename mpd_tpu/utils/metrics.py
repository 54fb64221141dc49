"""Aggregate-metrics export: csv + LaTeX tables.

Counterpart of the reference's save_metrics
(reference: mpd/utils/eval_helpers.py:558-584): mean/std over a results
table, written as csv and a LaTeX tabular.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def save_metrics(
    results: Sequence[Dict[str, float]],
    out_dir: str,
    name: str = "metrics",
    metric_keys: Optional[Sequence[str]] = None,
) -> Dict[str, Dict[str, float]]:
    """results: list of per-query metric dicts. Writes <name>.csv and
    <name>.tex; returns {metric: {mean, std}}."""
    os.makedirs(out_dir, exist_ok=True)
    if metric_keys is None:
        metric_keys = sorted({k for r in results for k in r if isinstance(r[k], (int, float))})

    summary = {}
    for k in metric_keys:
        vals = np.asarray([r[k] for r in results if r.get(k) is not None], dtype=np.float64)
        if len(vals) == 0:
            continue
        summary[k] = {"mean": float(vals.mean()), "std": float(vals.std())}

    csv_path = os.path.join(out_dir, f"{name}.csv")
    with open(csv_path, "w") as f:
        f.write("metric,mean,std\n")
        for k, s in summary.items():
            f.write(f"{k},{s['mean']:.6g},{s['std']:.6g}\n")

    tex_path = os.path.join(out_dir, f"{name}.tex")
    with open(tex_path, "w") as f:
        f.write("\\begin{tabular}{lrr}\n\\toprule\nmetric & mean & std \\\\\n\\midrule\n")
        for k, s in summary.items():
            f.write(f"{k.replace('_', ' ')} & {s['mean']:.4g} & {s['std']:.4g} \\\\\n")
        f.write("\\bottomrule\n\\end{tabular}\n")
    return summary
