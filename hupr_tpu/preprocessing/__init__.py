from hupr_tpu.preprocessing.process_iwr1843 import (
    RadarPreprocessor,
    decode_dca1000_np,
)
