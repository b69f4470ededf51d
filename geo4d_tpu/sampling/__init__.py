from geo4d_tpu.sampling.ddim import ddim_sample, DDIMTables
