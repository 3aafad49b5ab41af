from .factory import (
    build_dataset_loader_from_settings,
    build_modules,
    build_providers,
    build_router,
    filtered_kwargs,
    import_from_string,
    load_settings,
    parse_module_spec,
    resolve_env,
)

__all__ = [
    "build_dataset_loader_from_settings",
    "build_modules",
    "build_providers",
    "build_router",
    "filtered_kwargs",
    "import_from_string",
    "load_settings",
    "parse_module_spec",
    "resolve_env",
]
