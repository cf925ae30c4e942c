"""File I/O abstraction.

The reference routes all I/O through iopath's PathManager with a
``detectron2://`` handler (reference detectron2/utils/file_io.py:16). This
framework ships a small self-contained PathManager with the same call surface
(open / exists / isfile / ls / mkdirs / copy / get_local_path / register_handler)
covering local paths and http(s) URLs, so configs, checkpoints and datasets
remain cloud-storage-pluggable without an iopath dependency.
"""

import logging
import os
import shutil
from typing import IO, Any, Callable, Dict, List, Optional
from urllib.parse import urlparse

__all__ = ["PathManager", "PathHandler", "PathManagerBase"]

logger = logging.getLogger(__name__)


class PathHandler:
    """Base class for path handlers; handles paths with a given prefix."""

    def _get_supported_prefixes(self) -> List[str]:
        raise NotImplementedError

    def _get_local_path(self, path: str, **kwargs: Any) -> str:
        raise NotImplementedError

    def _open(self, path: str, mode: str = "r", **kwargs: Any) -> IO[Any]:
        raise NotImplementedError

    def _exists(self, path: str, **kwargs: Any) -> bool:
        local = self._get_local_path(path)
        return os.path.exists(local)

    def _isfile(self, path: str, **kwargs: Any) -> bool:
        return os.path.isfile(self._get_local_path(path))

    def _isdir(self, path: str, **kwargs: Any) -> bool:
        return os.path.isdir(self._get_local_path(path))

    def _ls(self, path: str, **kwargs: Any) -> List[str]:
        return sorted(os.listdir(self._get_local_path(path)))


class NativePathHandler(PathHandler):
    """Handles plain filesystem paths."""

    def _get_local_path(self, path: str, **kwargs: Any) -> str:
        return path

    def _open(self, path: str, mode: str = "r", **kwargs: Any) -> IO[Any]:
        if "w" in mode or "a" in mode:
            parent = os.path.dirname(os.path.abspath(path))
            if parent:
                os.makedirs(parent, exist_ok=True)
        return open(path, mode, **kwargs)

    def _exists(self, path: str, **kwargs: Any) -> bool:
        return os.path.exists(path)

    def _isfile(self, path: str, **kwargs: Any) -> bool:
        return os.path.isfile(path)

    def _isdir(self, path: str, **kwargs: Any) -> bool:
        return os.path.isdir(path)

    def _ls(self, path: str, **kwargs: Any) -> List[str]:
        return sorted(os.listdir(path))


class HTTPURLHandler(PathHandler):
    """Downloads http(s) URLs to a local cache directory."""

    def __init__(self) -> None:
        self.cache_map: Dict[str, str] = {}

    def _get_supported_prefixes(self) -> List[str]:
        return ["http://", "https://"]

    def _get_local_path(self, path: str, **kwargs: Any) -> str:
        if path not in self.cache_map or not os.path.exists(self.cache_map[path]):
            import urllib.request

            parsed = urlparse(path)
            cache_dir = os.path.expanduser(
                os.environ.get("D2T_CACHE", "~/.cache/detectron2_tpu")
            )
            dirname = os.path.join(cache_dir, os.path.dirname(parsed.path.lstrip("/")))
            filename = os.path.basename(parsed.path)
            cached = os.path.join(dirname, filename)
            os.makedirs(dirname, exist_ok=True)
            if not os.path.isfile(cached):
                logger.info("Downloading %s ...", path)
                urllib.request.urlretrieve(path, cached)
                logger.info("URL %s cached in %s", path, cached)
            self.cache_map[path] = cached
        return self.cache_map[path]

    def _open(self, path: str, mode: str = "r", **kwargs: Any) -> IO[Any]:
        assert "w" not in mode and "a" not in mode, "HTTP paths are read-only"
        return open(self._get_local_path(path), mode, **kwargs)


class PathManagerBase:
    """Dispatcher from path prefix to PathHandler; mirrors iopath PathManager."""

    def __init__(self) -> None:
        self._path_handlers: Dict[str, PathHandler] = {}
        self._native_handler = NativePathHandler()

    def register_handler(self, handler: PathHandler) -> None:
        for prefix in handler._get_supported_prefixes():
            assert prefix not in self._path_handlers, f"duplicate handler for {prefix}"
            self._path_handlers[prefix] = handler

    def _get_handler(self, path: str) -> PathHandler:
        for prefix, handler in self._path_handlers.items():
            if path.startswith(prefix):
                return handler
        return self._native_handler

    def open(self, path: str, mode: str = "r", **kwargs: Any) -> IO[Any]:
        return self._get_handler(path)._open(path, mode, **kwargs)

    def get_local_path(self, path: str, **kwargs: Any) -> str:
        return self._get_handler(path)._get_local_path(path, **kwargs)

    def exists(self, path: str, **kwargs: Any) -> bool:
        return self._get_handler(path)._exists(path, **kwargs)

    def isfile(self, path: str, **kwargs: Any) -> bool:
        return self._get_handler(path)._isfile(path, **kwargs)

    def isdir(self, path: str, **kwargs: Any) -> bool:
        return self._get_handler(path)._isdir(path, **kwargs)

    def ls(self, path: str, **kwargs: Any) -> List[str]:
        return self._get_handler(path)._ls(path, **kwargs)

    def mkdirs(self, path: str, **kwargs: Any) -> None:
        local = self.get_local_path(path)
        os.makedirs(local, exist_ok=True)

    def rm(self, path: str, **kwargs: Any) -> None:
        local = self.get_local_path(path)
        if os.path.isdir(local):
            shutil.rmtree(local)
        elif os.path.exists(local):
            os.remove(local)

    def copy(self, src_path: str, dst_path: str, overwrite: bool = False) -> bool:
        src = self.get_local_path(src_path)
        dst = self.get_local_path(dst_path)
        if os.path.exists(dst) and not overwrite:
            return False
        os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
        shutil.copyfile(src, dst)
        return True

    def symlink(self, src_path: str, dst_path: str) -> bool:
        try:
            os.symlink(src_path, dst_path)
            return True
        except OSError:
            return False


class Detectron2Handler(PathHandler):
    """Resolve ``detectron2://`` URLs to the public model-zoo bucket
    (reference utils/file_io.py:16-36)."""

    PREFIX = "detectron2://"
    S3_DETECTRON2_PREFIX = "https://dl.fbaipublicfiles.com/detectron2/"

    def __init__(self, http_handler: HTTPURLHandler) -> None:
        self._http = http_handler

    def _get_supported_prefixes(self) -> List[str]:
        return [self.PREFIX]

    def _get_local_path(self, path: str, **kwargs: Any) -> str:
        name = path[len(self.PREFIX) :]
        return self._http._get_local_path(self.S3_DETECTRON2_PREFIX + name, **kwargs)

    def _open(self, path: str, mode: str = "r", **kwargs: Any) -> IO[Any]:
        assert "w" not in mode and "a" not in mode
        return open(self._get_local_path(path), mode, **kwargs)


class ModelCatalogHandler(PathHandler):
    """Resolve legacy ``catalog://`` names through checkpoint.catalog
    (reference checkpoint/catalog.py ModelCatalogHandler)."""

    PREFIX = "catalog://"

    def __init__(self, http_handler: HTTPURLHandler) -> None:
        self._http = http_handler

    def _get_supported_prefixes(self) -> List[str]:
        return [self.PREFIX]

    def _get_local_path(self, path: str, **kwargs: Any) -> str:
        from detectron2_tpu.checkpoint.catalog import resolve_catalog_url

        return self._http._get_local_path(resolve_catalog_url(path), **kwargs)

    def _open(self, path: str, mode: str = "r", **kwargs: Any) -> IO[Any]:
        assert "w" not in mode and "a" not in mode
        return open(self._get_local_path(path), mode, **kwargs)


PathManager = PathManagerBase()
_http_handler = HTTPURLHandler()
PathManager.register_handler(_http_handler)
PathManager.register_handler(Detectron2Handler(_http_handler))
PathManager.register_handler(ModelCatalogHandler(_http_handler))
