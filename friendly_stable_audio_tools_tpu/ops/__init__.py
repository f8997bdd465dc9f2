from .activations import Snake, SnakeBeta, get_activation, snake_beta
from .convs import WNConv1d, WNConvTranspose1d, Conv1d, ConvTranspose1d
