"""UI layer: gradio text2img builder + static media grid viewer."""

from .media_viewer.grid_tools import grid_html, write_media_grid

__all__ = ['grid_html', 'write_media_grid']
