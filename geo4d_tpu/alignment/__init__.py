from geo4d_tpu.alignment.optimizer import GroupAligner, AlignerConfig
