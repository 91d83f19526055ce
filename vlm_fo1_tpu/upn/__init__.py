from vlm_fo1_tpu.upn.wrapper import UPNWrapper  # noqa: F401
