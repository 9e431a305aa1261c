"""CMF triage: column profiles + systematics detection
(reference: triage/cmf_profile.py, triage/COVID/*)."""

from .profile import (column_stats, summarize_cmf, systematics_count,
                      flag_systematics, profile_files, plot_stats,
                      ANG_NCOLS)
from .systematics import (load_systematics_list, validate_systematics,
                          confusion_report)
