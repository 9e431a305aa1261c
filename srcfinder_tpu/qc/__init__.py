"""Plume QC: label taxonomy, labeling sessions, consensus merge
(reference: cmftagger/)."""

from .labels import (LIDCOL, CIDCOL, LATCOL, LONCOL, LABCOL, CLSCOL,
                     UIDCOL, EVALCOL, KEEPLAB, REJLAB, PLUMELAB, SUPERLAB,
                     POSLABS, NEGLABS, AMBLABS, AMBLAB, FALSELAB,
                     classlabs, next_cid, lnglat_to_meters,
                     meters_to_lnglat, cmff_to_lid, lid2uidassign,
                     save_flag_csv, load_flag_csv)
from .collect import (gather_submitted, filter_flightlines,
                      consensus_label, consensus_candidates, collect_qcdata)
from .session import CircularBuffer, QcSession, load_settings
from .webapp import QcWebApp, user_port, render_cmf_png
