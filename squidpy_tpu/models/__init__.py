from squidpy_tpu.models.clustering import gmm_cluster, graph_cluster, knn_graph, pca_embed, zscore

__all__ = ["graph_cluster", "gmm_cluster", "knn_graph", "pca_embed", "zscore"]
