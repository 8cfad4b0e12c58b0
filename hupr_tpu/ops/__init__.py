from hupr_tpu.ops.dsp import (
    RadarParams,
    decode_dca1000,
    radar_cube_single_frame,
    radar_cube_frames,
)
from hupr_tpu.ops.resize import resize_linear_align_corners
from hupr_tpu.ops.heatmap import (
    generate_target,
    generate_target_batch,
    get_max_preds,
    bce_loss,
)
from hupr_tpu.ops.normalize import normalize_radar_window
