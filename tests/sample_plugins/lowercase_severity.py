"""Sample reference-style plugin: lowercases the severity field.

Shape mirrors the reference's plugin contract (utils/plugins.py:43-56):
a module-level ``message`` class with ``registration``, ``priority``,
and ``onMessage(message, metadata) -> (message, metadata) | (None, m)``.
"""


class message:
    def __init__(self):
        self.registration = ["severity"]
        self.priority = 5

    def onMessage(self, message, metadata):
        if message.get("severity") is not None:
            message["severity"] = str(message["severity"]).lower()
        return (message, metadata)
