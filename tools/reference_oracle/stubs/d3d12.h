// empty stub: the reference includes <Windows.h> unconditionally; nothing
// from it is used on the CPU decode path compiled here
#pragma once
