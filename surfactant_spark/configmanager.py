"""Configuration manager — the surfactant/configmanager.py analog.

Settings live in a JSON file under a per-app config dir
(``$SURFACTANT_SPARK_CONFIG_DIR`` or ``~/.config/surfactant_spark``),
addressed as ``section.option`` like the reference's
``ConfigManager.get/set`` (configmanager.py:60-120); values are cached
in-process and written through on set.  JSON instead of TOML — the
sandbox ships no toml writer, and the contract (typed get/set,
section.option addressing, persistence across invocations) is the
part that matters.

Engine consumers read knobs from here when the caller passes nothing:
e.g. the CLI session dir, default sink format.  On a cluster the
config file lives on the submitting host — per-job overrides travel
through spark-submit conf, not this file.
"""

from __future__ import annotations

import json
import os


class ConfigManager:
    _instances: dict[str, "ConfigManager"] = {}

    def __new__(cls, app_name: str = "surfactant_spark",
                config_dir: str | None = None):
        key = f"{app_name}|{config_dir}"
        if key not in cls._instances:
            inst = super().__new__(cls)
            inst._init(app_name, config_dir)
            cls._instances[key] = inst
        return cls._instances[key]

    def _init(self, app_name: str, config_dir: str | None) -> None:
        base = (
            config_dir
            or os.environ.get("SURFACTANT_SPARK_CONFIG_DIR")
            or os.path.join(
                os.environ.get(
                    "XDG_CONFIG_HOME", os.path.expanduser("~/.config")
                ),
                app_name,
            )
        )
        self.config_file_path = os.path.join(base, "config.json")
        self._config: dict | None = None

    def _load(self) -> dict:
        if self._config is None:
            try:
                with open(self.config_file_path) as f:
                    self._config = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                self._config = {}
        return self._config

    def get(self, section: str, option: str, fallback=None):
        return self._load().get(section, {}).get(option, fallback)

    def set(self, section: str, option: str, value) -> None:
        cfg = self._load()
        cfg.setdefault(section, {})[option] = value
        os.makedirs(os.path.dirname(self.config_file_path), exist_ok=True)
        tmp = self.config_file_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cfg, f, indent=2, sort_keys=True)
        os.replace(tmp, self.config_file_path)

    def delete(self, section: str, option: str | None = None) -> bool:
        cfg = self._load()
        if section not in cfg:
            return False
        if option is None:
            del cfg[section]
        elif option in cfg[section]:
            del cfg[section][option]
        else:
            return False
        os.makedirs(os.path.dirname(self.config_file_path), exist_ok=True)
        tmp = self.config_file_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cfg, f, indent=2, sort_keys=True)
        os.replace(tmp, self.config_file_path)
        return True


def coerce_value(value: str):
    """'true'/'false' → bool, like the reference's config command
    (surfactant/cmd/config.py:34-41); everything else stays a string."""
    if value.lower() == "true":
        return True
    if value.lower() == "false":
        return False
    return value
