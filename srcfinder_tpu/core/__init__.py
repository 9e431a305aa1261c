"""Core host-side utilities: ENVI I/O, geodesy, morphology, tiles, labels.

The TPU-native replacement for the reference's shared utility kernel
(reference: srcfinder_util.py).
"""

from .envi import (EnviImage, open_envi, create_envi, save_envi, find_header,
                   read_header, write_header, dtype_to_envi, envi_to_dtype,
                   NODATA)
from .geo import (latlon2utm, utm2latlon, geo2utmzone, utmzone2epsg,
                  epsg2utmzone, sl2xy, xy2sl, sl2latlon, latlon2sl,
                  latlon2xy, rotxy, mapinfo, mapdict2str, geobbox, gcdist)
from .morphology import (CONN4, CONN8, imlabel, findobj, disk, bwopen,
                         bwdilate, bwdist, mergelabels, remove_small_objects,
                         relabel_sequential, region_maxima, local_maxima,
                         imresize)
from .stats import counts, extrema, mad
from .labels import (CMFBG, POINTSRC, DIFFSRC, FALSESRC, LOCSRC, CMFLABELS,
                     LIDCOL, CIDCOL, LATCOL, LONCOL, LABCOL, XLSCOL, EVALCOL,
                     rgb2labimg, labimg2rgb, loadlabimg, float2rgba,
                     rgba2float)
from .tiles import pixbox, inbbox, extract_tile, bbox_overlap, iou
from .physics import ime, ime_scale
from .geotiff import write_geotiff, read_geotiff
from .loaders import (loadcmf, loadmaskedimage, loadfiltdet, loaddetids,
                      loadsaliencemap, load_plumedf, parse_masks, mask2rgb,
                      absnorm, smoothbil)
from .prefetch import prefetch_to_device, BlockPrefetcher
from .native import HAVE_NATIVE, bil_window_to_lcb, label8
