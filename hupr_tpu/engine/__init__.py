from hupr_tpu.engine.runner import Runner
from hupr_tpu.engine.steps import (
    TrainState,
    init_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
)
from hupr_tpu.engine.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_torch_checkpoint,
)
from hupr_tpu.engine.logger import Logger
from hupr_tpu.engine.chunk_train import (
    ChunkTrainLoader,
    make_chunk_train_step,
)
