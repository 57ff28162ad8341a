from .config import load_config, apply_overrides, instantiate, to_dict
