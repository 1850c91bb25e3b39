from gaitlab.body import joints, smpl  # noqa: F401
