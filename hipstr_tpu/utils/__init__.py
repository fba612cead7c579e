from .mathops import (
    LOG_ONE_HALF,
    log_sum_exp,
    log_sum_exp_pair,
    streaming_lse_init,
    streaming_lse_update,
    streaming_lse_finish,
)
