"""Custom sources: paginated-REST-shaped Python DataSource and multimodal
binary-column plumbing."""
