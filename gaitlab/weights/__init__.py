from gaitlab.weights import torch_import  # noqa: F401
