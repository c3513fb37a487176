from pyspectrogram_tpu.display.colormap import (
    get_colormap,
    quantize_levels,
    rgba_lut,
    spectral_legacy_colors,
    viridis_colors,
)
from pyspectrogram_tpu.display.render import (
    apply_lut,
    freq_crop_decimate,
    quantize_on_device,
    save_psd_csv,
    save_sti_png,
    sti_tile,
)

__all__ = [
    "apply_lut",
    "freq_crop_decimate",
    "get_colormap",
    "quantize_levels",
    "quantize_on_device",
    "rgba_lut",
    "save_psd_csv",
    "save_sti_png",
    "spectral_legacy_colors",
    "sti_tile",
    "viridis_colors",
]
