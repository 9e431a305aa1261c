"""Model zoo: GoogLeNet-1ch (Flax) + torch checkpoint conversion + FCN.

(reference: cnn/archs/googlenet1.py, cnn/models/*)
"""

from .googlenet import (GoogLeNet, googlenet, CAMPAIGN_NORM, clamp_ch4,
                        adaptive_avg_pool2d)
from .convert import torch_state_dict_to_flax, load_pt, flax_to_torch_state_dict
from .fcn import fcn_apply, fcn_saliency
