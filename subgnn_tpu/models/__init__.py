from .lstm import init_lstm_params, lstm_forward
from .mpn import init_mpn_params, mpn_layer
from .subgnn import SubGNNModel
from . import attention

__all__ = [
    "init_lstm_params",
    "lstm_forward",
    "init_mpn_params",
    "mpn_layer",
    "SubGNNModel",
    "attention",
]
