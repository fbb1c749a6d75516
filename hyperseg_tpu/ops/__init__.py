from hyperseg_tpu.ops import meta, patch
