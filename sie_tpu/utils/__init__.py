from sie_tpu.utils.tools import EarlyStopping, convert_to_hms, gini_coefficient  # noqa: F401
