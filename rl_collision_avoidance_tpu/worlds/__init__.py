from .spec import (WorldSpec, ResetMode, stage1, stage2, circle, circle_train,
                   mini, get_world, circle_tables, stage2_tables)

__all__ = [
    "WorldSpec", "ResetMode", "stage1", "stage2", "circle", "circle_train",
    "mini", "get_world", "circle_tables", "stage2_tables",
]
