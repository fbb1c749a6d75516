from hyperseg_tpu.nn import functional
