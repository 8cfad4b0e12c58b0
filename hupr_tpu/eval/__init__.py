from hupr_tpu.eval.cocoeval import (
    HUPR_OKS_SIGMAS,
    KeypointEvaluator,
    KeypointEvalParams,
)
