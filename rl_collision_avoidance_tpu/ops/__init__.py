from .lidar_pallas import make_scan_fn

__all__ = ["make_scan_fn"]
