"""MSF workflow: winds, emissions, clustering, dedup, persistence,
inversion, harvesting, orchestration (reference: msf_flow/)."""

from .windgrid import (WindGrid, read_wind_grid, write_wind_grid_npz,
                       register_reader, read_grib2_simple)
from .wind import (distance_spherical, distance_index, nearest_points,
                   wind_mnstd, plumetime_format, nearst_hm, read_plumes,
                   gather_plumes)
from .emission import (WindType, get_mean_wind_key, get_std_wind_key,
                       compute_emission_rate, compute_wind_stats)
from .cluster import cluster, cluster_plume_list, source_num_to_str
from .dedup import (teale_albers, circle_overlap_fraction, overlap_matrix,
                    calculate_overlap, filter_plumes_recursive,
                    filter_plumes, remove_duplicate_plumes)
from .persistence import (read_shapefile_polygons, point_in_polygon,
                          plumes_per_source, flightlines_per_source,
                          source_persistence)
from .inversion import (ols_inversion, bayesian_inversion,
                        background_percentile)
from .harvester import (load_dataset_conf, set_date_range, replace_template,
                        paths_generator, harvest_date_range,
                        invoke_harvester_windows, wind_quality_check)
from .stations import (station_wind_speed, get_station_data_for_plume,
                       plume_datetime_from_cid)
from .utils import DirWatcher, init_logger, concat_csvs
from .deploy import Job, JobQueue, watch_and_trigger, IME_JOB_DEFAULTS
from .msf_flow import (process_plume, process_plumes, insert_plumes_in_file,
                       get_minppmm_from_fname)
from .ime_worker import (detection_ime_stats, compute_ime_for_cmf,
                         IME_JOB_PARAMS)
from .wind_export import (regrid_to_latlon, write_wind_nc, wind_grid_to_nc,
                          parse_wind_filename_date)
