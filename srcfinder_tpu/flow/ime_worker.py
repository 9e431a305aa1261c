"""Compute-IME worker: per-detection integrated methane enhancement.

The reference's IME Batch worker lives in an external fork (noted at
msf_flow/deployment/README.md:23-26); its invoke script documents the
job parameters (deployment/compute-ime/invoke-ime:21-33: CMF_DIR,
PPMMTHR=1500, FETCHMAX=150, MERGEDISTS="10 20 50", MINAREA=9) and the
toolkit ships the IME math (srcfinder_util.py:1989-1996) and the
detection filtering it feeds on. This module implements that documented
methodology (Duren et al. 2019 IME/fetch formulation):

for each merge distance d in MERGEDISTS:
  - threshold the CMF at PPMMTHR, drop components under MINAREA px
  - merge components within d pixels (mergelabels)
  - per merged plume: IME (kg), fetch = plume length capped at FETCHMAX m,
    IME/fetch (kg/m), area, centroid lat/lon

The per-plume AvgIMEdivFetch20/StdIMEdivFetch20 columns consumed by
:func:`srcfinder_tpu.flow.emission.compute_emission_rate` are the
mean/std of IME/fetch across the merge distances.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core.morphology import imlabel, mergelabels, remove_small_objects
from ..core.physics import ime
from ..core.geo import sl2latlon

__all__ = ["detection_ime_stats", "compute_ime_for_cmf",
           "IME_JOB_PARAMS"]

#: documented Batch parameters (reference: deployment/compute-ime/invoke-ime)
IME_JOB_PARAMS = dict(PPMMTHR=1500.0, FETCHMAX=150.0,
                      MERGEDISTS=(10, 20, 50), MINAREA=9)


def _plume_fetch(mask, ps, fetchmax):
    """Plume fetch: the along-maximum-extent length in meters, capped at
    ``fetchmax`` (the documented FETCHMAX=150 cap)."""
    rr, cc = np.nonzero(mask)
    if rr.size == 0:
        return 0.0
    extent = max(rr.max() - rr.min() + 1, cc.max() - cc.min() + 1) * ps
    return float(min(extent, fetchmax))


def detection_ime_stats(cmf, mapinfo_dict, ppmmthr=None, fetchmax=None,
                        mergedists=None, minarea=None, nodata=-9999.0):
    """Per-plume IME statistics table for one CMF band.

    Returns a DataFrame with one row per (merge distance, plume):
    mergedist, plume id, area px, IME (kg), fetch (m), IMEdivFetch (kg/m),
    centroid row/col and lat/lon.
    """
    p = IME_JOB_PARAMS
    ppmmthr = p["PPMMTHR"] if ppmmthr is None else ppmmthr
    fetchmax = p["FETCHMAX"] if fetchmax is None else fetchmax
    mergedists = p["MERGEDISTS"] if mergedists is None else mergedists
    minarea = p["MINAREA"] if minarea is None else minarea

    cmf = np.asarray(cmf, np.float32)
    valid = cmf != nodata
    ps = float(mapinfo_dict["xps"])
    det = (cmf >= ppmmthr) & valid
    lab0 = remove_small_objects(imlabel(det), min_size=minarea)

    rows = []
    for md in mergedists:
        md_px = max(int(round(md / ps)), 1)
        lab = mergelabels(lab0, md_px)
        for plume_id in np.unique(lab[lab > 0]):
            mask = lab == plume_id
            pix = cmf[mask]
            ime_kg = ime(np.clip(pix, 0, None), ps)
            fetch = _plume_fetch(mask, ps, fetchmax)
            rr, cc = np.nonzero(mask)
            r0, c0 = float(rr.mean()), float(cc.mean())
            lat, lon = sl2latlon(c0, r0, mapinfo=mapinfo_dict)
            rows.append(dict(mergedist_m=md, plume=int(plume_id),
                             area_px=int(mask.sum()), ime_kg=ime_kg,
                             fetch_m=fetch,
                             ime_div_fetch=ime_kg / fetch if fetch else np.nan,
                             row=r0, col=c0, lat=float(lat),
                             lon=float(lon)))
    return pd.DataFrame(rows)


def compute_ime_for_cmf(cmf_path, out_csv=None, **params):
    """CMF product -> IME stats CSV + the AvgIMEdivFetch20/
    StdIMEdivFetch20 summary consumed by the emission-rate stage."""
    from ..core.loaders import loadcmf
    from ..core.geo import mapinfo as _mapinfo
    from ..core.envi import open_envi

    img = open_envi(cmf_path)
    bip = np.asarray(img.open_memmap(interleave="bip"))
    cmf = bip[..., -1]
    m = _mapinfo(img)
    df = detection_ime_stats(cmf, m, **params)
    if out_csv:
        df.to_csv(out_csv, index=False)
    if len(df):
        summary = dict(
            **{"AvgIMEdivFetch20 (kg/m)": float(df.ime_div_fetch.mean()),
               "StdIMEdivFetch20 (kg/m)": float(df.ime_div_fetch.std(ddof=0))})
    else:
        summary = {"AvgIMEdivFetch20 (kg/m)": np.nan,
                   "StdIMEdivFetch20 (kg/m)": np.nan}
    return df, summary
