"""Detection pipelines: CNN/FCN saliency, salience->candidates, filtering.

(reference: cnn/cnn_pred_pipeline.py, cnn/fcn_pred_pipeline.py,
salience_predictions.py, srcfinder_util.py filtdet, cnn/posthoc_down.py)
"""

from .preprocess import preprocess_ch4, norm_for_model
from .fcn_pipeline import (fcn_shift_saliency, fcn_phase_saliency,
                           fcn_phase_saliency_blocked, stitch_stack,
                           fcn_saliency_image)
from .cnn_pipeline import (cnn_window_saliency, cnn_fast_saliency,
                           cnn_saliency_image)
from .salience import salience2detections, save_detections, DETECTION_COLUMNS
from .filtdet import filtdet, kde
from .posthoc_down import gaussian_downsample, gkern, get_pixsig
