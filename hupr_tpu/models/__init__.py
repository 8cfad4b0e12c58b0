from hupr_tpu.models.hupr import HuPRNet, build_model
from hupr_tpu.models.mnet import MNet
from hupr_tpu.models.encoder3d import Encoder3D
from hupr_tpu.models.mscsa import MSCSADecoder, spatial_attention
from hupr_tpu.models.prgcn import PRGCN, skeleton_adjacency
from hupr_tpu.models.torch_convert import convert_torch_checkpoint
