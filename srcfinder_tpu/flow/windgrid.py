"""Wind grid I/O — the pygrib replacement.

The reference decodes HRRR/RTMA GRIB2 with pygrib/eccodes (C libraries,
msf_flow/wind_processor/windspeed.py:259-288; the Docker image builds
eccodes from source, msf_flow/Dockerfile:10-56). pygrib is not available
here, so wind grids are read through a small adapter:

- ``.npz``: keys lat, lon (2D), u, v, gust (2D), valid_date (ISO string)
  — the native interchange format of this framework.
- ``.grib2``: a minimal pure-python GRIB2 decoder supporting grid
  definition template 3.0 (regular lat/lon) and data representation
  template 5.0 (simple packing). HRRR's complex/JPEG2000 packing is NOT
  supported; convert such products to .npz offline (or install pygrib
  and register a reader via :func:`register_reader`).
"""

from __future__ import annotations

import datetime as _dt
import os
import struct
from typing import Callable, NamedTuple

import numpy as np

__all__ = ["WindGrid", "read_wind_grid", "write_wind_grid_npz",
           "register_reader", "read_grib2_simple"]


class WindGrid(NamedTuple):
    lat: np.ndarray      # (ny, nx) degrees
    lon: np.ndarray      # (ny, nx) degrees
    u: np.ndarray        # (ny, nx) m/s at requested altitude
    v: np.ndarray        # (ny, nx) m/s
    gust: np.ndarray     # (ny, nx) m/s
    valid_date: _dt.datetime


_READERS: dict = {}


def register_reader(ext: str, fn: Callable[[str, int], WindGrid]):
    _READERS[ext] = fn


def read_wind_grid(path: str, alt: int = 10) -> WindGrid:
    """Read u/v/gust at ``alt`` meters (10 valid for HRRR+RTMA, 80 only
    HRRR — reference: windspeed.py:211-223)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in _READERS:
        return _READERS[ext](path, alt)
    raise ValueError(f"no wind-grid reader for {ext} ({path})")


def _read_npz(path: str, alt: int) -> WindGrid:
    z = np.load(path, allow_pickle=False)
    suffix = "" if alt == 10 else f"_{alt}"
    try:
        u = z[f"u{suffix}"] if f"u{suffix}" in z else z["u"]
        v = z[f"v{suffix}"] if f"v{suffix}" in z else z["v"]
    except KeyError:
        raise KeyError(f"wind at altitude {alt} not found in {path}")
    if alt not in (10, 80):
        raise ValueError(f"Altitude {alt} not valid for recognized data types")
    vd = _dt.datetime.fromisoformat(str(z["valid_date"]))
    return WindGrid(z["lat"], z["lon"], u, v, z["gust"], vd)


def write_wind_grid_npz(path: str, grid: WindGrid, alt: int = 10):
    suffix = "" if alt == 10 else f"_{alt}"
    np.savez(path, lat=grid.lat, lon=grid.lon,
             **{f"u{suffix}": grid.u, f"v{suffix}": grid.v},
             gust=grid.gust, valid_date=grid.valid_date.isoformat())


# ----------------------------------------------------------------------
# minimal GRIB2 decoder (regular lat/lon grid + simple packing)
# ----------------------------------------------------------------------

def _bits_to_uint(data: bytes, bit_offset: int, nbits: int, count: int):
    """Unpack ``count`` big-endian ``nbits``-wide unsigned ints."""
    if nbits == 0:
        return np.zeros(count, np.int64)
    arr = np.frombuffer(data, np.uint8)
    bits = np.unpackbits(arr)
    need = bit_offset + nbits * count
    bits = bits[bit_offset:need].reshape(count, nbits)
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)
    return bits.astype(np.int64) @ weights


def read_grib2_simple(path: str, alt: int = 10) -> WindGrid:
    """Decode a GRIB2 file with template 3.0 grids + 5.0 simple packing.

    Parameter identification (discipline 0, category 2): u = number 2,
    v = 3, gust = 22; altitude from the fixed-surface value of product
    template 4.0 (type 103 = height above ground).
    """
    fields = {}
    meta = {}
    with open(path, "rb") as f:
        blob = f.read()
    pos = 0
    while pos < len(blob):
        if blob[pos:pos + 4] != b"GRIB":
            break
        total_len = struct.unpack(">Q", blob[pos + 8:pos + 16])[0]
        msg = blob[pos:pos + total_len]
        pos += total_len
        i = 16
        grid = None
        prod = None
        drs = None
        bmp = None
        while i < len(msg) - 4:
            if msg[i:i + 4] == b"7777":
                break
            sec_len = struct.unpack(">I", msg[i:i + 4])[0]
            sec_num = msg[i + 4]
            body = msg[i:i + sec_len]
            if sec_num == 1:
                year, month, day, hour, minute, sec = struct.unpack(
                    ">H5B", body[12:19])
                meta["valid_date"] = _dt.datetime(year, month, day, hour,
                                                  minute, sec)
            elif sec_num == 3:
                tmpl = struct.unpack(">H", body[12:14])[0]
                if tmpl != 0:
                    raise ValueError(f"grid template {tmpl} unsupported")
                ni = struct.unpack(">I", body[30:34])[0]
                nj = struct.unpack(">I", body[34:38])[0]
                la1 = struct.unpack(">i", body[46:50])[0] / 1e6
                lo1 = struct.unpack(">i", body[50:54])[0] / 1e6
                la2 = struct.unpack(">i", body[55:59])[0] / 1e6
                lo2 = struct.unpack(">i", body[59:63])[0] / 1e6
                grid = (ni, nj, la1, lo1, la2, lo2,
                        msg[i + 71])  # scanning mode
            elif sec_num == 4:
                category, number = body[9], body[10]
                surf_type = body[22]
                prod = (category, number, surf_type)
            elif sec_num == 5:
                tmpl = struct.unpack(">H", body[9:11])[0]
                if tmpl != 0:
                    raise ValueError(
                        f"data representation template {tmpl} unsupported "
                        "(only simple packing); convert to .npz")
                R = struct.unpack(">f", body[11:15])[0]
                E = struct.unpack(">h", body[15:17])[0]
                D = struct.unpack(">h", body[17:19])[0]
                nbits = body[19]
                drs = (R, E, D, nbits)
            elif sec_num == 6:
                if body[5] != 255:
                    bmp = np.unpackbits(
                        np.frombuffer(body[6:], np.uint8)).astype(bool)
            elif sec_num == 7:
                R, E, D, nbits = drs
                ni, nj, la1, lo1, la2, lo2, scan = grid
                npts = ni * nj
                if bmp is not None:
                    nvals = int(bmp[:npts].sum())
                else:
                    nvals = npts
                packed = _bits_to_uint(body[5:], 0, nbits, nvals)
                vals = (R + packed * (2.0 ** E)) / (10.0 ** D)
                if bmp is not None:
                    full = np.full(npts, np.nan)
                    full[bmp[:npts]] = vals
                    vals = full
                fields[prod[:2]] = vals.reshape(nj, ni)
            i += sec_len

    ni, nj, la1, lo1, la2, lo2, scan = grid
    lats = np.linspace(la1, la2, nj)
    lons = np.linspace(lo1, lo2, ni)
    lon2d, lat2d = np.meshgrid(lons, lats)
    try:
        u = fields[(2, 2)]
        v = fields[(2, 3)]
        gust = fields[(2, 22)]
    except KeyError as e:
        raise KeyError(f"wind band missing in {path}: {e}")
    return WindGrid(lat2d, lon2d, u, v, gust, meta["valid_date"])


register_reader(".npz", _read_npz)
register_reader(".grib2", read_grib2_simple)
register_reader(".grb2", read_grib2_simple)
