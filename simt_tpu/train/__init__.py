from . import state
from .simt import create_simt_state, make_simt_step
from .warmup import create_warmup_state, make_warmup_step
