from . import frontend, rnn, rnnt_loss  # noqa: F401
