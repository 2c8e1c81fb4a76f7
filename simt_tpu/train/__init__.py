from . import state
from .loop import build_loader, build_mesh, build_models, train
from .simt import create_simt_state, make_simt_step
from .warmup import create_warmup_state, make_warmup_step
