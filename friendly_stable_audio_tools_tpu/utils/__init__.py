from .common import (
    set_seed,
    count_parameters,
    get_rank,
    get_world_size,
    print_once,
    copy_state_dict,
)
