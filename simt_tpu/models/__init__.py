from .resnet_multi import ResNetMulti, deeplab_multi
from . import ntm
from . import import_torch
