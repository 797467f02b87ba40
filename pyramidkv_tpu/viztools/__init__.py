from .attention import capture_attentions
from .plots import attn_mp, plot_heatmap, plot_attention_heatmaps, needle_heatmap
