PromptType = str | list[str]
