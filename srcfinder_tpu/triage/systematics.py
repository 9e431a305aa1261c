"""COVID systematics validation against a curated flightline list.

Reference (triage/COVID/COVID_systematics_ID_Deliver.py): 280 hand-labeled
flightlines with severity 0 / 0.5 / 1 / 2; the detector's 0/1 flags are
scored strict (0 vs nonzero severity) and loose (<1 vs >=1), plus
per-severity true-positive counts — the repo's only regression oracle
(expected output checked into COVID_Example_Output.txt).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .profile import flag_systematics

__all__ = ["load_systematics_list", "validate_systematics",
           "confusion_report"]


def load_systematics_list(path):
    """Parse the curated list: lines of '<flightline>, <severity>'
    (severity in {0, 0.5, 1, 2}; the real COVID_systematics.txt is
    comma-separated — whitespace accepted too)."""
    names, sev = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = [p.strip() for p in
                     (line.split(",") if "," in line else line.split())]
            if len(parts) >= 2:
                names.append(parts[0])
                sev.append(float(parts[1]))
    return names, np.asarray(sev)


def validate_systematics(names, severities, stats_dir,
                         med_column="med", nadj_col=3, nsigma_col=3.0):
    """Run the detector over each flightline's column-stats CSV and score
    against curated severities (reference:
    COVID_systematics_ID_Deliver.py:184-351). Missing CSVs raise, like the
    reference's file-count check (:184-191)."""
    result = np.zeros(len(names))
    for i, name in enumerate(names):
        csvf = os.path.join(stats_dir, name + "_column_stats.csv")
        if not os.path.exists(csvf):
            raise FileNotFoundError(csvf)
        df = pd.read_csv(csvf)
        med = df[med_column].values if med_column in df else df["avg"].values
        result[i] = flag_systematics(med, nadj_col=nadj_col,
                                     nsigma_col=nsigma_col)
    return confusion_report(np.asarray(severities), result)


def confusion_report(systematics, result):
    """Strict/loose confusion counts + per-severity TPs (reference:
    COVID_systematics_ID_Deliver.py:266-351)."""
    rep = {
        # strict: exactly-0 severity vs any detector flag
        "strict": {
            "none_tp": int(((systematics == 0) & (result == 0)).sum()),
            "none_fp": int(((systematics == 0) & (result != 0)).sum()),
            "any_tp": int(((systematics != 0) & (result != 0)).sum()),
            "any_fn": int(((systematics != 0) & (result == 0)).sum()),
        },
        # loose: severity < 1 (incl. maybes) vs flag
        "loose": {
            "none_tp": int(((systematics < 1) & (result < 1)).sum()),
            "none_fp": int(((systematics < 1) & (result >= 1)).sum()),
            "any_tp": int(((systematics >= 1) & (result >= 1)).sum()),
            "any_fn": int(((systematics >= 1) & (result < 1)).sum()),
        },
        "strong_tp": int(((systematics == 2) & (result > 0)).sum()),
        "weak_tp": int(((systematics == 1) & (result > 0)).sum()),
        "maybe_tp": int(((systematics == 0.5) & (result < 1)).sum()),
    }
    return rep
