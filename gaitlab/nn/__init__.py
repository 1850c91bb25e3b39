from gaitlab.nn import grnet, hrnet, layers, pare_head  # noqa: F401
