from .swap import swap_features, swap_features_dynamic, choose_region
