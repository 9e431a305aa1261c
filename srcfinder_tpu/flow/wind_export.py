"""Wind grid -> CF/ACDD-compliant NetCDF export with lat/lon regridding.

Reference (msf_flow/wind_processor/get_wind_bands.py): subset the
HRRR/RTMA wind bands, reproject the native grid to EPSG:4326 at 0.025
degrees (:81-143 ``reproject`` via gdal.ReprojectImage), and write a
NetCDF with CF variable attributes + rich ACDD global metadata
(:145-263 ``write_nc``).

GDAL/netCDF4 are unavailable here: regridding is nearest-neighbor
inverse lookup on the grid's own lat/lon arrays (valid for the regular
and near-regular grids HRRR/RTMA use), and the file is NetCDF-3 classic
via scipy.io.netcdf_file — readable by every NetCDF tool.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

from .windgrid import WindGrid, read_wind_grid

__all__ = ["regrid_to_latlon", "write_wind_nc", "wind_grid_to_nc",
           "parse_wind_filename_date"]

GRID_RES_DEG = 0.025   # (reference: get_wind_bands.py reprojection target)


def regrid_to_latlon(grid: WindGrid, res: float = GRID_RES_DEG):
    """Nearest-neighbor regrid of u/v/gust onto a regular lat/lon grid
    covering the input extent (reference: get_wind_bands.py:81-143)."""
    lat0, lat1 = float(grid.lat.min()), float(grid.lat.max())
    lon0, lon1 = float(grid.lon.min()), float(grid.lon.max())
    lats = np.arange(lat0, lat1 + res / 2, res)
    lons = np.arange(lon0, lon1 + res / 2, res)
    # invert the (near-)regular source grid by axis lookup
    src_lat = grid.lat[:, 0]
    src_lon = grid.lon[0, :]
    ri = np.clip(np.searchsorted(src_lat, lats), 0, len(src_lat) - 1)
    ri = np.where((ri > 0)
                  & (np.abs(src_lat[ri - 1] - lats)
                     < np.abs(src_lat[ri] - lats)), ri - 1, ri)
    ci = np.clip(np.searchsorted(src_lon, lons), 0, len(src_lon) - 1)
    ci = np.where((ci > 0)
                  & (np.abs(src_lon[ci - 1] - lons)
                     < np.abs(src_lon[ci] - lons)), ci - 1, ci)
    out = {name: np.asarray(band)[np.ix_(ri, ci)]
           for name, band in (("u", grid.u), ("v", grid.v),
                              ("gust", grid.gust))}
    return lats, lons, out


_CF_ATTRS = {
    "u": dict(standard_name=b"eastward_wind", units=b"m s-1",
              long_name=b"10 metre U wind component"),
    "v": dict(standard_name=b"northward_wind", units=b"m s-1",
              long_name=b"10 metre V wind component"),
    "gust": dict(standard_name=b"wind_speed_of_gust", units=b"m s-1",
                 long_name=b"Wind speed (gust)"),
}


def write_wind_nc(path, lats, lons, bands, valid_date,
                  title="Wind bands", source="srcfinder_tpu"):
    """CF + ACDD NetCDF-3 writer (reference: get_wind_bands.py:145-263)."""
    from scipy.io import netcdf_file
    with netcdf_file(path, "w") as nc:
        nc.createDimension("lat", len(lats))
        nc.createDimension("lon", len(lons))
        vlat = nc.createVariable("lat", "d", ("lat",))
        vlat[:] = lats
        vlat.standard_name = b"latitude"
        vlat.units = b"degrees_north"
        vlon = nc.createVariable("lon", "d", ("lon",))
        vlon[:] = lons
        vlon.standard_name = b"longitude"
        vlon.units = b"degrees_east"
        for name, arr in bands.items():
            var = nc.createVariable(name, "f", ("lat", "lon"))
            var[:] = arr.astype(np.float32)
            for k, v in _CF_ATTRS.get(name, {}).items():
                setattr(var, k, v)
        nc.title = title.encode()
        nc.source = source.encode()
        nc.Conventions = b"CF-1.8"
        nc.time_coverage_start = valid_date.isoformat().encode()
        nc.date_created = _dt.datetime.now(
            _dt.timezone.utc).isoformat().encode()
        nc.geospatial_lat_min = float(np.min(lats))
        nc.geospatial_lat_max = float(np.max(lats))
        nc.geospatial_lon_min = float(np.min(lons))
        nc.geospatial_lon_max = float(np.max(lons))
    return path


def wind_grid_to_nc(grid_path, nc_path, alt: int = 10,
                    res: float = GRID_RES_DEG):
    """One wind granule -> regridded CF NetCDF."""
    grid = read_wind_grid(grid_path, alt=alt)
    lats, lons, bands = regrid_to_latlon(grid, res)
    return write_wind_nc(nc_path, lats, lons, bands, grid.valid_date)


def parse_wind_filename_date(fname: str):
    """Date from HRRR/RTMA filenames (reference:
    get_wind_bands.py:265-302): hrrr.YYYYMMDDHH.wrfsfcf00.grib2 or
    rtma2p5_ru.YYYYMMDDHHMMz.2dvaranl_ndfd.grib2."""
    import os
    import re
    base = os.path.basename(fname)
    m = re.search(r"hrrr\.(\d{10})\.", base)
    if m:
        return _dt.datetime.strptime(m[1], "%Y%m%d%H")
    m = re.search(r"rtma2p5_ru\.(\d{12})z", base)
    if m:
        return _dt.datetime.strptime(m[1], "%Y%m%d%H%M")
    raise ValueError(f"unrecognized wind filename {base}")
