from njw_tpu.platform.device import (
    DeviceCaps, detect, hbm_bandwidth_gbps, tpu_generation, default_mesh,
    stencil_block_shape, is_tpu_available, get_device_info,
)
