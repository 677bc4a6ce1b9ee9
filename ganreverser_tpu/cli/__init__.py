"""CLI entry points — the reference's seven scripts (SURVEY.md §1 L5):

  train        <- train.lua
  train_r      <- train_r.lua
  apply_r      <- apply_r.lua
  pretrain_g   <- pretrain_g.lua
  pretrain_prev<- pretrain_with_previous_net.lua
  sample       <- sample.lua
  show         <- show_model_content.lua

Run any of them as ``python -m ganreverser_tpu.cli.<name> --help``.
"""
